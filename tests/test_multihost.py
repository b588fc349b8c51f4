"""True multi-process multi-host training: two jax.distributed processes,
each owning 4 virtual CPU devices, run the production Trainer.fit over a
global 8-device mesh with per-process (rank-strided) batch halves.

This is the TPU-pod analog of the reference's torchelastic/SLURM multi-node
DDP (README.md:22, trainer/cli.py:123-129): jax.distributed.initialize over
DCN, `make_array_from_process_local_data` assembling the global batch from
host-local slices (parallel/mesh.py shard_batch), XLA collectives doing the
gradient reduction. Both ranks must produce identical, finite losses.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r'''
import os, sys, json

rank = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]; fsdp = int(sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=rank)

import numpy as np
sys.path.insert(0, r"@REPO@")
sys.path.insert(0, r"@REPO@/tests")
from test_engine_smoke import make_tiny_engine
from neurosis_tpu.trainer.loop import HashTokenizer, Trainer

assert jax.device_count() == 8 and jax.local_device_count() == 4

engine = make_tiny_engine(use_ema=False)
trainer = Trainer(engine, max_steps=2, default_root_dir=outdir + "/rank" + str(rank),
                  tokenizer=HashTokenizer(), devices=8, fsdp=fsdp)

def make_local_batch(seed):
    rng = np.random.RandomState(seed)
    g = {
        "image": rng.randn(8, 16, 16, 3).astype(np.float32),
        "caption_ids": rng.randint(0, 63, (8, 8)).astype(np.int32),
        "uncond_ids": np.zeros((1, 8), np.int32),
        "size": (rng.rand(8, 1) * 16).astype(np.float32),
    }
    return {k: (v[rank * 4:(rank + 1) * 4] if v.shape[0] == 8 else v) for k, v in g.items()}

batches = [make_local_batch(i) for i in range(2)]
state, frozen = trainer.fit(lambda: iter(batches))
losses = [json.loads(l)["loss"] for l in (trainer.root_dir / "logs" / "metrics.jsonl").read_text().splitlines()]
print("RESULT " + json.dumps({"rank": rank, "losses": losses, "mesh": dict(trainer.mesh.shape)}), flush=True)
'''


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("fsdp", [1, 2])
def test_two_process_trainer_fit(tmp_path, fsdp):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("@REPO@", repo))
    port = _free_port()

    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(r), str(port), str(tmp_path), str(fsdp)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for r in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            # 1-core box under full-suite load: 2 jax imports + compile
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["rank"]] = r

    assert results[0]["mesh"] == {"data": 8 // fsdp, "fsdp": fsdp}
    l0, l1 = results[0]["losses"], results[1]["losses"]
    assert len(l0) == 2 and all(abs(a) < 1e6 for a in l0)
    assert l0 == l1, "ranks diverged"
