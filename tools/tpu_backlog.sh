#!/bin/bash
# Run the round-4 TPU validation backlog, one process at a time.
# Touch /tmp/stop_backlog to abort between steps (e.g. before the driver's
# scored bench run — two TPU processes time-slice the chip).
cd /root/repo
log=/tmp/tpu_backlog.log
stop=/tmp/stop_backlog
echo "=== backlog start $(date +%H:%M:%S) ===" >> $log
run_step() {
  if [ -e $stop ]; then echo "backlog stopped by sentinel at $(date +%H:%M:%S)" >> $log; exit 0; fi
  echo "--- $1 $(date +%H:%M:%S) ---" >> $log
  shift
  "$@" >> $log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $log
}
for probe in dispatch tracker nms scan scene; do
  run_step "probe $probe" timeout 1800 python tools/tpu_checks.py $probe
done
run_step "bench.py" timeout 1800 python bench.py
for probe in yolos yolom yolol yolox; do
  run_step "probe $probe" timeout 2400 python tools/tpu_checks.py $probe
done
echo "=== probes+bench done $(date +%H:%M:%S) ===" >> $log
if [ -e $stop ]; then echo "backlog stopped before suite" >> $log; exit 0; fi
echo "--- suite $(date +%H:%M:%S) ---" >> $log
timeout 5400 python benchmarks/suite.py > /tmp/suite_r4.out 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $log
echo "=== backlog really done $(date +%H:%M:%S) ===" >> $log
