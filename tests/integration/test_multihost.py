"""Multi-host (DCN) smoke test: two OS processes initialise
``jax.distributed`` through ``initialise_multihost``
(idiaptts_tpu/parallel/mesh.py), build a global mesh spanning both
processes and run a jit reduction over a process-sharded global batch —
the cross-process collective path the single-process suite cannot
exercise (SURVEY.md §2.8 multi-host over DCN)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from idiaptts_tpu.parallel.mesh import initialise_multihost
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    initialise_multihost(coordinator_address=coord,
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    mesh = Mesh(jax.devices(), ("data",))
    local = jnp.full((1, 4), float(pid + 1))
    batch = jax.make_array_from_process_local_data(
        NamedSharding(mesh, PartitionSpec("data")), local, (nproc, 4))
    total = float(jax.jit(jnp.sum)(batch))
    expected = sum(4.0 * (i + 1) for i in range(nproc))
    assert abs(total - expected) < 1e-6, (total, expected)
    print("MH_OK", pid, total)
""")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    worker = tmp_path / "mh_worker.py"
    worker.write_text(_WORKER.format(repo=repo))
    coord = "127.0.0.1:{}".format(_free_port())
    env = dict(os.environ)
    # Workers must NOT inherit the virtual 8-device flag: each process
    # contributes its own (single) CPU device to the global mesh.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "worker {} failed:\n{}".format(pid, out)
        assert "MH_OK {}".format(pid) in out, out
