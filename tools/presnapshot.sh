#!/bin/sh
# Round-end gate: never snapshot a tree that doesn't compile (round-7 lesson).
# Run as the LAST action of every round; exits non-zero on any failure.
set -e
cd "$(dirname "$0")/.."
sbt -batch Test/compile
