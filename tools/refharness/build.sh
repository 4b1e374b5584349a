#!/bin/sh
# Compile the reference solver slice (read-only sources under
# /root/reference) plus compile-only shims and the RefSolve driver into
# $1 (default: target/refharness). Used by RefParitySpec.
set -e
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
OUT="${1:-$REPO/target/refharness}"
REF_SRC="${REF_SRC:-/root/reference/src}"
mkdir -p "$OUT"
javac -nowarn -encoding UTF-8 -d "$OUT" \
  -sourcepath "$REF_SRC:$REPO/tools/refharness/stubs:$REPO/tools/refharness/driver" \
  "$REPO/tools/refharness/driver/RefSolve.java" \
  "$REPO/tools/refharness/driver/RefFormats.java"
echo "refharness compiled to $OUT"
