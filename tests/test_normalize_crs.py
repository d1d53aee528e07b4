"""M1 / M15 / M16 / O3 coverage: ona-text parser, GADM column normalizer,
level resolution, Mercator round-trip (reference ``utils.py:12-24``,
``etl/_split_buildings.py:9-23``, ``_parcels.py:34-48``)."""
import numpy as np
import pyarrow as pa
import pytest

from prclz_ray.geom import wkb
from prclz_ray.geom.crs import lnglat_to_mercator, mercator_to_lnglat
from prclz_ray.stages.normalize import (clean_gadm_cols, parse_ona_batch,
                                        parse_ona_text, resolve_gadm_level)


class TestParseOna:
    def test_parses_lat_lng_pairs_to_polygon(self):
        """Reference swaps "y x …" pairs to (x, y) (``utils.py:14``)."""
        txt = "1.0 10.0 0 5; 2.0 11.0 0 5; 1.5 12.0 0 5"
        buf = parse_ona_text(txt)
        t, v = wkb.decode(buf)
        assert t == wkb.POLYGON
        ring = v[0]
        assert np.allclose(ring[0], [10.0, 1.0])     # (lng, lat)
        assert np.allclose(ring[1], [11.0, 2.0])

    def test_rejects_short_or_malformed(self):
        assert parse_ona_text("1.0 10.0 0 5; 2.0 11.0 0 5") is None
        assert parse_ona_text("notanumber;") is None
        batch = pa.table({"geo_text": ["1 10 0 0; 2 11 0 0; 1.5 12 0 0",
                                       None]})
        out = parse_ona_batch(batch)
        assert out["geometry"][0].as_py() is not None
        assert out["geometry"][1].as_py() is None


class TestGadmNormalizer:
    def _tbl(self):
        return pa.table({
            "GID_0": ["DJI", "DJI"],
            "GID_1": ["DJI.1", "DJI.2"],
            "GID_2": ["DJI.1.1", "DJI.2.1"],
            "name": ["a", "b"],
        })

    def test_highest_level_wins(self):
        out = clean_gadm_cols(self._tbl())
        assert out.column_names == ["name", "gadm_code", "gadm"]
        assert out["gadm_code"].to_pylist() == ["DJI.1.1", "DJI.2.1"]
        assert out["gadm"].to_pylist() == ["DJI", "DJI"]

    def test_target_level_and_fallback(self):
        assert resolve_gadm_level(["GID_0", "GID_1", "GID_2"], 1) == "GID_1"
        # requested level absent → fall back to highest (utils.py:17-24)
        assert resolve_gadm_level(["GID_0", "GID_1"], 5) == "GID_1"
        with pytest.raises(ValueError):
            resolve_gadm_level(["name"])


class TestMercator:
    def test_roundtrip_subcentimeter(self):
        lng = np.array([-179.9, -43.2, 0.0, 43.15, 179.9])
        lat = np.array([-60.0, -11.8, 0.0, 11.59, 75.0])
        x, y = lnglat_to_mercator(lng, lat)
        lng2, lat2 = mercator_to_lnglat(x, y)
        # sub-centimeter: 1e-9 deg ≈ 0.1 mm
        assert np.abs(lng2 - lng).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9

    def test_known_point(self):
        # equator/meridian maps to origin; 1° lng ≈ 111.32 km at equator
        x, y = lnglat_to_mercator(0.0, 0.0)
        assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
        x1, _ = lnglat_to_mercator(1.0, 0.0)
        assert abs(float(x1) - 111319.49) < 1.0
