#!/bin/bash
# List PIDs (age + cmd) of every process that can hold the axon TPU chip:
# any python whose BOOT-TIME environment carries PALLAS_AXON_POOL_IPS (the
# sitecustomize trigger that dials the relay at interpreter start).
# Command-line pattern matching is NOT sufficient — a one-off debug script
# with an unmatched name overlapped the S22 DF sweep on 2026-08-18 and
# corrupted its device buffers (S01 E=-4.6e13).  Conversely, /proc/environ
# is the boot snapshot, so CPU-side runs launched via
# `env -u PALLAS_AXON_POOL_IPS` (tests, CPU sweeps) correctly don't match.
# The relay pump itself (~/.tpu_init.py) never runs jax ops and is excluded.
#
# Usage: tools/chip_claimants.sh   (empty output + rc 1 => chip free)
found=1
for p in /proc/[0-9]*; do
  pid=${p#/proc/}
  [ "$pid" = "$$" ] && continue
  cmd=$(tr '\0' ' ' < "$p/cmdline" 2>/dev/null)
  case "$cmd" in
    *python*) ;;
    *) continue ;;
  esac
  case "$cmd" in
    *tpu_init*) continue ;;
  esac
  if grep -qz "PALLAS_AXON_POOL_IPS=" "$p/environ" 2>/dev/null; then
    echo "$pid $(ps -o etime= -p "$pid" 2>/dev/null | tr -d ' ') ${cmd:0:100}"
    found=0
  fi
done
exit $found
