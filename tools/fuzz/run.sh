#!/usr/bin/env bash
# ASAN/UBSAN decoder battery (VERDICT r4 #8; SURVEY.md §5 sanitizers).
#
# Compiles the first-party decoders + the fuzz harness with
# -fsanitize=address,undefined (no -ffast-math, no -march=native: this
# build chases memory bugs, not throughput), then decodes the checked-in
# corpus plus MUTANTS deterministic mutations of every seed with every
# decoder. Any OOB access / UB aborts the run.
#
# Usage: tools/fuzz/run.sh [MUTANTS] [SEED]
set -euo pipefail
cd "$(dirname "$0")/../.."

MUTANTS="${1:-300}"
SEED="${2:-1}"
BUILD=tools/fuzz/build
mkdir -p "$BUILD"

SAN="-fsanitize=address,undefined -fno-sanitize-recover=all"
CXXFLAGS="-O1 -g -fno-omit-frame-pointer -std=c++17 $SAN"

SRCS="decoder.cpp flac.cpp mp3.cpp demux.cpp alac.cpp vorbis.cpp aac.cpp"
OBJS=""
for s in $SRCS; do
  o="$BUILD/${s%.cpp}.o"
  if [ ! -f "$o" ] || [ "soundscope_tpu/native/$s" -nt "$o" ]; then
    echo "  CXX(asan) $s"
    g++ $CXXFLAGS -c "soundscope_tpu/native/$s" -o "$o"
  fi
  OBJS="$OBJS $o"
done
echo "  CXX(asan) fuzz_decoders.cpp"
g++ $CXXFLAGS tools/fuzz/fuzz_decoders.cpp $OBJS -o "$BUILD/fuzz_decoders"

export ASAN_OPTIONS="abort_on_error=1:detect_leaks=1"
export UBSAN_OPTIONS="print_stacktrace=1"
"$BUILD/fuzz_decoders" --mutants "$MUTANTS" --seed "$SEED" \
  tools/fuzz/corpus/*
echo "sanitizer battery PASS (mutants=$MUTANTS seed=$SEED)"
