#!/bin/bash
# Opportunistic quiet-window capture: retry bench.py until a window reads
# below the threshold, then run the zoo + one interaction A/B in the same
# window. Logs to /tmp/quiet_hunter.log.
cd /root/repo
THRESH_MS=1.55
for i in $(seq 1 8); do
  echo "=== attempt $i $(date +%H:%M:%S) ===" >> /tmp/quiet_hunter.log
  out=$(timeout 2400 python bench.py 2>>/tmp/quiet_hunter.log)
  echo "$out" >> /tmp/quiet_hunter.log
  val=$(echo "$out" | python3 -c "import sys,json; d=json.loads(sys.stdin.read()); print(d['value'])" 2>/dev/null)
  if [ -z "$val" ]; then sleep 600; continue; fi
  ms=$(python3 -c "print(8192/$val*1000)")
  echo "attempt $i: $ms ms/step" >> /tmp/quiet_hunter.log
  quiet=$(python3 -c "print(1 if $ms < $THRESH_MS else 0)")
  if [ "$quiet" = "1" ]; then
    echo "QUIET WINDOW at attempt $i ($ms ms) - running zoo + interact" >> /tmp/quiet_hunter.log
    timeout 2400 python -m benchmarks._bench_zoo >> /tmp/quiet_hunter.log 2>&1
    timeout 1200 python -m benchmarks._ablate_interact_mxu >> /tmp/quiet_hunter.log 2>&1
    echo "QUIET CAPTURE DONE" >> /tmp/quiet_hunter.log
    exit 0
  fi
  sleep 600
done
echo "no quiet window found in 8 attempts" >> /tmp/quiet_hunter.log
