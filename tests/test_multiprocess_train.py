"""Real 2-process distributed TRAINING test (VERDICT r2 item 3).

The reference's whole training story is multi-node torchrun + DDP /
DeepSpeed (reference dist_test.sh:6-16,
wedetect_ref/scripts/run_stage3.sh NNODES/RANK). The TPU-native
equivalent is a global-view jit over a mesh that spans processes —
this test actually exercises that DCN path: two jax.distributed CPU
processes x 4 virtual devices each form one global 8-device
("data", "fsdp") mesh, the SAME global batch is sharded across them,
and two train steps run with gradient psum and SyncBN batch statistics
crossing the process boundary.

Pass criteria:
- both processes see finite, IDENTICAL losses (replicated outputs);
- the losses match a 1-process 8-device control run of the exact same
  code (tests/dist_train_common.py) — i.e. the cross-process
  collectives computed the same global reduction the single-process
  mesh does. Step 2's loss depends on step 1's parameter update, so
  agreement here also pins the optimizer update path.
"""

import os
import re
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:%d",
        num_processes=2, process_id=pid)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4
    sys.path.insert(0, %r)
    sys.path.insert(0, %r)
    from dist_train_common import run_steps
    from wedetect_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, fsdp=2)      # spans both processes
    losses = run_steps(mesh, n_steps=2)
    assert np.isfinite(losses).all(), losses
    print("LOSSES", pid, repr(losses), flush=True)
    print("WORKER_OK", pid, flush=True)
""")


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tests_dir = os.path.join(repo, "tests")
    script = tmp_path / "worker.py"
    script.write_text(WORKER % (29437, repo, tests_dir))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.skip("distributed init timed out in this sandbox")
        outs.append(out.decode())
    worker_losses = {}
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, out[-3000:]
        assert f"WORKER_OK {i}" in out
        m = re.search(rf"LOSSES {i} (\[.*?\])", out)
        assert m, out[-3000:]
        worker_losses[i] = eval(m.group(1))  # [float, float] repr

    # identical across processes (replicated jit outputs)
    np.testing.assert_allclose(worker_losses[0], worker_losses[1],
                               rtol=0, atol=0)

    # 1-process 8-device control run of the same code (this test
    # session already has the 8-device CPU platform via conftest)
    import jax

    from dist_train_common import run_steps
    from wedetect_tpu.parallel.mesh import make_mesh

    control = run_steps(make_mesh(data=4, fsdp=2,
                                  devices=jax.devices()[:8]),
                        n_steps=2)
    # cross-process psum may reduce in a different association order
    # than the single-process lowering -> small f32 tolerance
    np.testing.assert_allclose(worker_losses[0], control, rtol=1e-5)
