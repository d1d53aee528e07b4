#!/bin/bash
# Probe-gated scaling campaign: wait for a quiet host window (CPU spin
# ratio AND memory-bandwidth ratio near idle), then run bench.py
# --scaling.  Stops after a run achieves efficiency >= 0.8 or after
# MAX_TRIES gated attempts.  Respects /tmp/graft_fg_busy (foreground
# work lockfile) and writes its own /tmp/graft_scaling_running marker.
cd /root/repo
OUT_DIR=/tmp/scaling_watch
mkdir -p "$OUT_DIR"
MAX_TRIES=${MAX_TRIES:-12}
tries=0
while [ "$tries" -lt "$MAX_TRIES" ]; do
  if [ -f /tmp/graft_fg_busy ]; then sleep 120; continue; fi
  probe=$(python scripts/hostprobe.py 2>/dev/null)
  echo "$(date +%T) probe $probe" >> "$OUT_DIR/log"
  r=$(echo "$probe" | python -c "import sys,json;print(json.load(sys.stdin)['ratio'])")
  b=$(echo "$probe" | python -c "import sys,json;print(json.load(sys.stdin)['bw_ratio'])")
  ok=$(python -c "print(1 if $r<=1.35 and $b<=16 else 0)")
  if [ "$ok" = "1" ]; then
    tries=$((tries+1))
    ts=$(date +%s)
    touch /tmp/graft_scaling_running
    echo "$(date +%T) firing scaling run (try $tries)" >> "$OUT_DIR/log"
    GRAFT_SCALING_REPS=${GRAFT_SCALING_REPS:-2} python bench.py --scaling > "$OUT_DIR/scaling_$ts.json" 2> "$OUT_DIR/scaling_$ts.err"
    rm -f /tmp/graft_scaling_running
    eff=$(tail -1 "$OUT_DIR/scaling_$ts.json" | python -c "import sys,json;print(json.load(sys.stdin).get('value',0))" 2>/dev/null || echo 0)
    echo "$(date +%T) run $ts efficiency=$eff" >> "$OUT_DIR/log"
    good=$(python -c "print(1 if $eff>=0.8 else 0)")
    [ "$good" = "1" ] && { echo "DONE eff=$eff at $ts" >> "$OUT_DIR/log"; exit 0; }
  fi
  sleep 240
done
echo "EXHAUSTED after $tries gated tries" >> "$OUT_DIR/log"
