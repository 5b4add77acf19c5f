"""Real 2-process distributed eval-merge test.

Spawns two jax.distributed CPU processes and verifies
all_gather_object (the torch all_gather_object replacement), barrier,
and process_shard — the SURVEY §2.6 inference-sharding path.
"""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:%d",
        num_processes=2, process_id=pid)
    sys.path.insert(0, %r)
    from wedetect_tpu.eval.dist import all_gather_object, barrier
    from wedetect_tpu.eval.runner import process_shard
    payload = {"rank": pid, "data": list(range(pid * 3, pid * 3 + 3))}
    out = all_gather_object(payload)
    assert len(out) == 2 and out[1]["data"] == [3, 4, 5], out
    assert len(list(process_shard(10))) == 5
    barrier()
    print("WORKER_OK", pid, flush=True)
""")


@pytest.mark.slow
def test_two_process_gather(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = 29431
    script = tmp_path / "worker.py"
    script.write_text(WORKER % (port, repo))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.skip("distributed init timed out in this sandbox")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, out[-2000:]
        assert f"WORKER_OK {i}" in out
