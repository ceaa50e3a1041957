#!/bin/bash
# Full-registry sf1 sweep with PER-KEY TIMING ARCHIVED (the
# bench_history discipline applied to the round's longest ritual):
# graft.Verify records spark-side per-key seconds (verify_times.json),
# check_oracle's TALLY carries duckdb-side per-key seconds, and the
# merged artifact lands in sweep_history/ so the next round diffs
# sweep cost BY KEY instead of re-running to find out what grew.
set -e
SF_DIR=${1:-/root/repo/target/sf1}
OUT_DIR=${2:-/tmp/sf1_sweep_out}
STAMP=$(date +%Y%m%d_%H%M%S)
TAG=$(basename "$SF_DIR")
cd /root/repo
mkdir -p sweep_history
sbt -batch compile 1>&2
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
SCALA_LIB=$(ls "$HOME"/.sbt/boot/scala-2.13.*/lib/scala-library.jar 2>/dev/null | head -1)
[ -z "$SCALA_LIB" ] && SCALA_LIB=$(find "$HOME/.cache/coursier" -name 'scala-library-2.13*.jar' 2>/dev/null | head -1)
rm -rf "$OUT_DIR"
java $ADD_OPENS -Xmx16g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:$SCALA_LIB:/opt/spark/jars/*" \
  graft.Verify "$SF_DIR" "$OUT_DIR" 1>&2
python3 /root/repo/tools/check_oracle.py "$SF_DIR" "$OUT_DIR" \
  --times-out "sweep_history/sweep_${TAG}_${STAMP}.json" "${@:3}"
