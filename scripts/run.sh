#!/bin/bash
# Dev-loop runner: java with the Spark-on-JDK17 --add-opens set and the
# sbt-exported classpath. The classpath cache lives OUTSIDE the
# worktree (/tmp/graft.cp.<build-hash>): its content is local absolute
# jar paths, which the leak scanner re-flags whenever the file exists
# in-tree — keep the tree clean instead of adjudicating it every round.
# The cache file is KEYED on a hash of build.sbt so a dependency edit
# auto-invalidates it (a bare existence check ran stale jar sets
# silently — ADVICE r11); delete /tmp/graft.cp.* to force regeneration.
# Usage:
#   MEM=8g scripts/run.sh graft.Bench [args...]
# Mirrors build.sbt's javaOptions; the sbt runMain path stays the
# canonical one for the driver contract.
set -euo pipefail
cd "$(dirname "$0")/.."
MEM="${MEM:-8g}"
BUILD_HASH="$(sha1sum build.sbt | cut -c1-8)"
CP_CACHE="${CP_CACHE:-/tmp/graft.cp.$BUILD_HASH}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
[ -f "$CP_CACHE" ] || sbt -batch 'export runtime:fullClasspath' | tail -1 > "$CP_CACHE"
exec java -Xmx"$MEM" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$(cat "$CP_CACHE")" "$@"
