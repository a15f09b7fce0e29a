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

# Serving tier end-to-end on the real chip: server is the only TPU
# process (the loadgen is a pure HTTP client), so the one-process rule
# holds.  batch=8 amortizes the ~30 ms tunnel dispatch across sessions.
if [ ! -e $stop ]; then
  echo "--- serve loadgen $(date +%H:%M:%S) ---" >> $log
  timeout 2400 python app.py --backend serve --port 8745 --batch 8 --chunk 64 \
    > /tmp/serve_tpu.log 2>&1 &
  SERVE_PID=$!
  for i in $(seq 1 200); do
    sleep 5
    curl -s -m 2 http://127.0.0.1:8745/healthz > /dev/null && break
  done
  timeout 900 python tools/serve_loadgen.py --url http://127.0.0.1:8745 \
    --sessions 8 --chunks 4 > /tmp/serve_loadgen_tpu.json 2>>$log
  echo "loadgen exit=$? $(date +%H:%M:%S)" >> $log
  kill $SERVE_PID 2>/dev/null
  cat /tmp/serve_loadgen_tpu.json >> $log
fi
echo "=== backlog really done $(date +%H:%M:%S) ===" >> $log
