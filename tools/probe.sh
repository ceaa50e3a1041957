#!/bin/bash
# Isolated fresh-JVM probe of one registry key (no sbt in the loop):
#   tools/probe.sh <query> [cpus] [dir]
# run1 = cold (JIT/classload), run2 = the number to quote.
set -e
Q=$1
CPUS=${2:-32}
DIR=${3:-/root/testdata/sf0.1}
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
java $ADD_OPENS -Xmx12g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:$SCALA_LIB:/opt/spark/jars/*" \
  graft.IsolatedProbe "$Q" "$CPUS" "$DIR" 2>/dev/null | grep PROBE
