"""Snapshot the live learned 3-center chunk caps (~/.cache/jchem_xla/
csize3c.json, lost on every VM recycle) into the repo-bundled seed
(juliachem_jl_tpu/ops/data/csize3c_seed.json) so fresh VMs skip the failed
relay compile attempts that discovery costs (30-300 s per over-budget
class)."""
import json
import os

live_path = os.path.join(os.path.expanduser("~"), ".cache", "jchem_xla",
                         "csize3c.json")
seed_path = os.path.join(os.path.dirname(__file__), "..",
                         "juliachem_jl_tpu", "ops", "data",
                         "csize3c_seed.json")

seed = {}
try:
    with open(seed_path) as f:
        seed = json.load(f)
except (OSError, ValueError):
    pass
try:
    with open(live_path) as f:
        live = json.load(f)
except (OSError, ValueError):
    live = {}

changed = False
for k, v in live.items():
    if int(v) < int(seed.get(k, 1 << 30)):
        seed[k] = int(v)
        changed = True

if changed:
    os.makedirs(os.path.dirname(seed_path), exist_ok=True)
    with open(seed_path, "w") as f:
        json.dump(seed, f, indent=1, sort_keys=True)
    print(f"seed updated: {len(seed)} entries")
else:
    print(f"no new learned caps ({len(seed)} seeded)")
