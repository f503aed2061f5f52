"""Two-process multi-host rendezvous smoke test (ref: scripts/train.py:124-137,
configs/base_config.py:68-75).

Spawns two fresh python processes that rendezvous through
``machine.coordinator`` -> ``jax.distributed.initialize`` (the reference's
``dist.init_process_group(dist_url, machine_rank, num_machines)``), then
assert the global device view spans both processes and run a cross-process
barrier.  Runs on the CPU backend; skips if the environment forbids
subprocess networking.
"""
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""   # keep the axon plugin off
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from soccernerfs_tpu.parallel import mesh as meshlib

rank = int(sys.argv[1])
meshlib.initialize_distributed({coord!r}, num_machines=2, machine_rank=rank)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == rank
assert len(jax.devices()) == 2 * len(jax.local_devices()), (
    len(jax.devices()), len(jax.local_devices()))
# rank-0 gating helper sees the right rank
assert meshlib.is_main_process() == (rank == 0)
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("smoke")
print("MULTIHOST_OK", rank, len(jax.devices()))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rendezvous(tmp_path):
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo, coord=coord))

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host rendezvous timed out")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "Permission denied" in out or "unavailable" in out.lower()
        ):
            pytest.skip(f"environment forbids subprocess networking: {out[-200:]}")
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"MULTIHOST_OK {rank} 4" in out, out
