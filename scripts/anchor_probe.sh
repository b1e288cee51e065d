#!/bin/bash
# Anchor-window probe (r18, VERDICT item 1): run the 16-anchor filtered bench
# (~1 min/pass incl. JVM startup vs ~25 min full suite) repeatedly to hunt a
# clean scheduler-floor window, WITHOUT holding the sbt lock — the classpath
# is snapshotted to /tmp so sbt compile/test can run concurrently in the repo.
#
# Usage:
#   anchor_probe.sh snapshot          # copy classes + anchor file to $SNAP
#   anchor_probe.sh run               # one filtered pass; appends to $LOG
#   anchor_probe.sh loop              # run until $STOP exists
#   anchor_probe.sh full              # full-suite pass from the snapshot
# Results: one JSON line per pass in $LOG (the bench summary line), plus a
# one-line digest (floor, geomean) on stderr.
set -u
SNAP=/tmp/graft_bench_snap
LOG=${GRAFT_PROBE_LOG:-/tmp/graft_anchor_series.jsonl}
STOP=/tmp/graft_probe_stop
REPO=/root/repo

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

snapshot() {
  mkdir -p "$SNAP"
  rm -rf "$SNAP/classes"
  cp -r "$REPO/target/scala-2.13/classes" "$SNAP/classes"
  cp "$REPO/DUCKDB_ANCHOR.json" "$SNAP/"
  mkdir -p "$SNAP/target"
  echo "snapshot at $SNAP from $(git -C $REPO rev-parse --short HEAD)" >&2
}

one_pass() {  # $1 = filter env value ("anchors") or empty for full suite
  local filt="$1"
  local rep=1
  [ -n "$filt" ] && rep="${GRAFT_PROBE_REPEAT:-3}"
  cd "$SNAP" || exit 1
  local out
  out=$(SPARK_GRAFT_BENCH_QUERIES="$filt" \
        SPARK_GRAFT_BENCH_REPEAT="$rep" \
        java $ADD_OPENS -Xmx8g \
        -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
        -cp "$SNAP/classes:/opt/spark/jars/*" graft.Bench 2>/dev/null | tail -1)
  if [ -n "$out" ]; then
    echo "{\"ts\":\"$(date -u +%FT%TZ)\",\"rec\":$out}" >> "$LOG"
    echo "$out" | python3 -c '
import json,sys
r=json.load(sys.stdin)
c=r.get("canary",{})
floors=[c.get("open",-1)]+c.get("series",[])
g=r.get("anchor_geomean"); o=c.get("open"); v=r.get("value")
print("[probe] geomean=%s floor_min=%.3f floor_open=%s total=%s" % (g, min(floors), o, v), file=sys.stderr)'
  else
    echo "[probe] pass produced no output" >&2
  fi
}

case "${1:-run}" in
  snapshot) snapshot ;;
  run)      one_pass anchors ;;
  full)     one_pass "" ;;
  loop)
    rm -f "$STOP"
    while [ ! -e "$STOP" ]; do
      one_pass anchors
      sleep 5
    done
    echo "[probe] stop marker seen; exiting" >&2
    ;;
  *) echo "usage: $0 {snapshot|run|loop|full}" >&2; exit 2 ;;
esac
