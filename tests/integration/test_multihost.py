"""Multi-host (DCN) tests: two OS processes initialise
``jax.distributed`` through ``initialise_multihost``
(idiaptts_tpu/parallel/mesh.py), build a global mesh spanning both
processes, and drive the cross-process collective paths the
single-process suite cannot exercise (SURVEY.md §2.8 multi-host over
DCN): a jit reduction smoke, a full ``ModularModelHandler`` TRAIN STEP
over the global mesh (gradient all-reduce over the process boundary,
loss identical to a single-process run of the same global batch), and
an orbax checkpoint save/restore under multi-process sharding."""

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


_TRAIN_WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from idiaptts_tpu.parallel.mesh import initialise_multihost
    coord, nproc, pid, ckpt_dir = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    if nproc > 1:
        initialise_multihost(coordinator_address=coord,
                             num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc, jax.process_count()

    from idiaptts_tpu.data.dataset import collate_batch
    from idiaptts_tpu.hparams import ExtendedHParams
    from idiaptts_tpu.models.losses import NamedLoss
    from idiaptts_tpu.models.rnn_dyn import convert_legacy_string
    from idiaptts_tpu.train.handler import ModularModelHandler

    # The GLOBAL batch, identical in every process (deterministic
    # seed); the handler shards it over the global mesh, giving each
    # process's device its shard.  Variable lengths so the masked-loss
    # denominator is only correct if the cross-process program really
    # evaluates the global loss.
    D = 12
    rs = np.random.RandomState(0)
    samples = [{{"x": rs.randn(L, D).astype(np.float32),
                 "target": rs.randn(L, 4).astype(np.float32)}}
               for L in (17, 23)]
    batch = collate_batch(samples)

    def make_handler():
        cfg = convert_legacy_string("RNNDYN-1_RELU_16-1_FC_4", D)
        cfg.input_names = ("x",)
        cfg.output_names = ("pred",)
        h = ModularModelHandler()
        h.create_model(cfg, example_batch=batch)   # seeded: identical
        hp = ExtendedHParams.create_hparams()
        hp.optimiser_type = "SGD"
        hp.learning_rate = 0.01
        h.set_optimiser(hp)
        h.set_scheduler(hp)
        h.set_losses([NamedLoss.Config("mse", "MSELoss",
                                       ("pred", "target"),
                                       seq_mask="_seq_mask")])
        h.setup_mesh()           # global mesh over all processes
        return h

    h = make_handler()
    assert len(h.mesh.devices.flat) == max(nproc, 1) \\
        or nproc == 1, h.mesh
    losses = [h.process_batches([batch], training=True)[0]
              for _ in range(3)]
    print("MH_TRAIN", pid, " ".join("%.8f" % l for l in losses))

    # orbax sharded checkpoint: every process participates in the
    # save; restore into a fresh handler and verify parameter identity.
    h.checkpoint_backend = "orbax"
    h.save_checkpoint(ckpt_dir, model_name="mh", epoch=1)
    h2 = make_handler()
    h2.load_checkpoint(ckpt_dir, model_name="mh", epoch=1)
    import flax
    fa = flax.traverse_util.flatten_dict(jax.tree_util.tree_map(
        np.asarray, h.params), sep="/")
    fb = flax.traverse_util.flatten_dict(jax.tree_util.tree_map(
        np.asarray, h2.params), sep="/")
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fb[k], fa[k], err_msg=k)
    loss_restored = h2.process_batches([batch], training=False)[0]
    print("MH_CKPT_OK", pid, "%.8f" % loss_restored)
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


def _run_train_workers(tmp_path, nproc, tag):
    """Launch ``nproc`` _TRAIN_WORKER processes on a shared coordinator
    and return the parsed {pid: (losses, restored_loss)} results."""
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    worker = tmp_path / "mh_train_worker_{}.py".format(tag)
    worker.write_text(_TRAIN_WORKER.format(repo=repo))
    ckpt_dir = str(tmp_path / "ckpt_{}".format(tag))
    coord = "127.0.0.1:{}".format(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # one CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, str(nproc), str(pid),
         ckpt_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host train worker timed out")
        outs.append(out)
    results = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            "worker {} failed:\n{}".format(pid, out)
        train_line = [ln for ln in out.splitlines()
                      if ln.startswith("MH_TRAIN {}".format(pid))]
        ckpt_line = [ln for ln in out.splitlines()
                     if ln.startswith("MH_CKPT_OK {}".format(pid))]
        assert train_line and ckpt_line, out
        losses = [float(tok) for tok in train_line[0].split()[2:]]
        results[pid] = (losses, float(ckpt_line[0].split()[2]))
    return results


def test_two_process_handler_train_step_and_orbax_ckpt(tmp_path):
    """The REAL training engine across the process boundary: two
    processes run three ``ModularModelHandler`` train steps over a
    2-device global mesh (batch sharded across processes, gradient
    all-reduce over the jax.distributed transport) and their losses
    match a single-process run of the same global batch — proving the
    cross-process gradient is the global gradient, not a per-process
    one.  Then every process participates in an orbax sharded
    checkpoint save, restores it into a fresh handler, and the
    restored parameters and eval loss agree."""
    multi = _run_train_workers(tmp_path, 2, "mp")
    single = _run_train_workers(tmp_path, 1, "sp")
    assert multi[0][0] == multi[1][0], multi   # replicated loss agrees
    ref_losses = single[0][0]
    import numpy as np
    # rtol covers matmul partial-sum reduction-order noise between the
    # 2-device and 1-device programs (~2e-6 measured); a per-process
    # loss-averaging bug shows at percent level with these variable
    # lengths.
    np.testing.assert_allclose(multi[0][0], ref_losses, rtol=1e-4)
    # Restored-checkpoint eval loss equals across processes and runs.
    assert multi[0][1] == multi[1][1]
    np.testing.assert_allclose(multi[0][1], single[0][1], rtol=1e-4)
