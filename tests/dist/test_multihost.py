"""Multi-host (2-process) localhost test (SURVEY.md §4: "multi-host
logic tested by spawning N processes with jax.distributed.initialize").

Each process owns 4 virtual CPU devices; the 8-shard pipeline runs over
the joint mesh with per-process input feeding, and both processes must
assemble identical contigs.
"""
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", nproc, pid)
sys.path.insert(0, %(repo)r)
import hashlib
import numpy as np
from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.dist.mesh import make_mesh, fetch
from faucet_tpu.dist.sharded import ShardedPipeline

rng = np.random.default_rng(2024)
genome = simulate.genome_with_repeats(rng, 3000, 2, 200)
reads = simulate.shred(rng, genome, 40, 100, circular=True)
cfg = Config(size_kmer=21, max_read_length=100, batch_reads=64, n_shards=8,
             exact=True, estimated_kmers=1 << 14, singletons=1 << 14,
             junction_capacity=1 << 13, sink_capacity=1 << 14)
sp = ShardedPipeline(cfg, make_mesh(8))
half = [reads[i] for i in range(len(reads)) if (i // 32) %% 2 == pid]
sp.load_reads(half)
sp.scan_reads(half)
assert sp.metrics.counters.get("route_dropped", 0) == 0
g = sp.build()
g = sp.clean_graph(g)
# partitioned seed extraction (VERDICT r4 #8): the per-host bytes of an
# extract must track OCCUPIED rows, not table capacity — the old global
# fetch materialized capacity-sized arrays (>= 458 kB for this junction
# table) on every host
from faucet_tpu.graph.build import extract_table
jt = extract_table(sp.junctions)
row_bytes = 4 + 4 + 8 * 4 + 8 * 2
assert extract_table.last_bytes < 8 * len(jt["hi"]) * row_bytes + 4096, (
    f"extract materialized {extract_table.last_bytes} bytes for "
    f"{len(jt['hi'])} occupied rows")
assert extract_table.last_bytes < (1 << 13) * row_bytes // 2
keys = sorted(g.contigs[i].canonical_seq() for i in g.live())
digest = hashlib.sha256("#".join(keys).encode()).hexdigest()
print(f"RESULT {len(keys)} {digest}", flush=True)
"""


@pytest.mark.timeout(400)
def test_two_process_localhost(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": _REPO})
    env = dict(os.environ)
    env["PYTHONPATH"] = env.get("PYTHONPATH", "") + os.pathsep + _REPO
    port = "12657"
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=360)
        assert p.returncode == 0, err[-3000:]
        outs.append([l for l in out.splitlines()
                     if l.startswith("RESULT")][0])
    assert outs[0] == outs[1], "processes disagree on the assembly"
    n = int(outs[0].split()[1])
    assert n >= 3
