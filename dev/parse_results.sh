#!/bin/bash
# Role of reference dev/parse_results.sh: grep speed/memory/AP lines from a
# training log for tracking.
LOG="$1"
[ -z "$LOG" ] && { echo "usage: parse_results.sh <log file>"; exit 1; }
grep -o 'time: [0-9.]*' "$LOG" | tail -1
grep -o 'data_time: [0-9.]*' "$LOG" | tail -1
grep -A2 'copypaste: Task' "$LOG" | tail -6
