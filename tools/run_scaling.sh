#!/bin/bash
# N->4N scaling evidence: run the identical ScaleBench fixture at local[8]
# and local[32], 3 runs each (min taken against host noise), and report
# efficiency = (T_8 / T_32) / 4.
set -e
cd "$(dirname "$0")/.."
RUNS=${RUNS:-3}
for c in 8 32; do
  for i in $(seq $RUNS); do
    SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=$c sbt -batch "runMain graft.ScaleBench" 2>&1 \
      | grep -oE '\{"metric":"pipeline".*\}' >> /tmp/scale_runs.jsonl
  done
done
python3 - <<'PY'
import json
runs = [json.loads(l) for l in open('/tmp/scale_runs.jsonl')]
best = {}
for r in runs:
    c = int(r['cpus'])
    if c not in best or r['value'] < best[c]['value']:
        best[c] = r
t8, t32 = best[8]['value'], best[32]['value']
eff = (t8 / t32) / 4
k8, k32 = best[8]['kernel_images_per_sec'], best[32]['kernel_images_per_sec']
print(json.dumps({'t8_sec': t8, 't32_sec': t32,
  'ips8': best[8]['images_per_sec'], 'ips32': best[32]['images_per_sec'],
  'efficiency_8_to_32': round(eff, 3),
  'kernel_ips8': k8, 'kernel_ips32': k32,
  'kernel_efficiency_8_to_32': round((k32 / k8) / 4, 3),
  'stages8': best[8]['queries'], 'stages32': best[32]['queries']}, indent=1))
PY
