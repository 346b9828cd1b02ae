#!/bin/bash
# Round-end gate: everything the driver/judge touches, end to end.
# Usage: ./scripts/round_check.sh   (runs CPU-forced except the TPU bench)
set -e
cd "$(dirname "$0")/.."
CPU="env PYTHONPATH= JAX_PLATFORMS=cpu"

echo "=== 1/8 test suite ==="
python -m pytest tests/ -q -p no:cacheprovider | tail -1

echo "=== 2/8 graft entry + multichip dryrun (fresh process) ==="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python -c "
import sys; sys.path.insert(0, '.')
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
fn, args = g.entry()
print('entry:', jax.jit(fn)(*args).shape)
g.dryrun_multichip(8)"

echo "=== 3/8 demo song via trackmixer CLI ==="
rm -rf /tmp/round_check && $CPU python examples/make_demo_song.py /tmp/round_check > /dev/null
$CPU python trackmixer.py /tmp/round_check/demo.ini -o /tmp/round_check/mix.wav | tail -1

echo "=== 4/8 MIDI render via trackmixer CLI ==="
$CPU python - <<'EOF'
import sys; sys.path.insert(0, '.')
from synthesizer_tpu.midi import MidiNote, write_midi
notes = [MidiNote(i*0.15, 0.12, 57+i*3, 100, 0) for i in range(6)]
open('/tmp/round_check/t.mid', 'wb').write(write_midi(notes))
EOF
$CPU python trackmixer.py /tmp/round_check/t.mid -o /tmp/round_check/t.wav | tail -1

echo "=== 5/8 render server over a real socket ==="
$CPU python - <<'EOF'
import sys, json, http.client
sys.path.insert(0, '.')
from synthesizer_tpu.server import RenderServer
srv = RenderServer(port=0).start()
conn = http.client.HTTPConnection('127.0.0.1', srv.port, timeout=120)
conn.request('GET', '/health'); print(conn.getresponse().read().decode())
body = json.dumps({"duration": 0.2, "patch": {"node": "osc", "kind": "sine", "frequency": 440}})
conn.request('POST', '/render/patch', body=body)
r = conn.getresponse(); data = r.read()
assert r.status == 200 and data[:4] == b'RIFF', (r.status, data[:16])
print(f'patch render: {len(data)} WAV bytes')
srv.stop()
EOF

echo "=== 6/8 bench (real TPU; fresh process pays the axon bootstrap) ==="
# axon bootstrap measured 63-820 s in rounds 1-4; late round 5 it
# degraded to 1,099-2,167 s (BASELINE.md round-5 spread note) — the
# timeout budgets the measured worst case plus the bench itself
timeout 4000 python bench.py

echo "=== 7/8 on-chip fidelity battery (HARD GATE: must pass on TPU) ==="
# every waveform x {FM, PWM, ADSR, echo}, XLA vs compiled Pallas, and all
# five BASELINE configs vs their host oracles — the class of check that
# caught the round-1 MXU bf16 bug, which the CPU suite cannot see.
timeout 4800 python scripts/tpu_verify.py | tee /tmp/tpu_verify_out.txt
grep -q "ALL PASS" /tmp/tpu_verify_out.txt
cp /tmp/tpu_verify_out.txt TPU_VERIFY.txt

echo "=== 8/8 battery staleness guard (VERDICT r3 #2) ==="
# trips when TPU_VERIFY.txt's commit predates the last render-engine
# commit — the fresh copy above satisfies it; COMMIT it with the round.
./scripts/battery_fresh.sh

echo "=== round check: ALL OK ==="
