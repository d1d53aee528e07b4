from . import schemas, synth  # noqa: F401
