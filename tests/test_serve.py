"""Persistent generation service: protocol, warm-up, cache reuse."""

import threading
import time

import jax
import numpy as np
import pytest

from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.eval.generate import GenerationRunner
from agdiff_tpu.models.dualenc import get_model
from agdiff_tpu.models.schedules import make_diffusion
from agdiff_tpu.sampling import SamplerConfig
from agdiff_tpu.serve.server import GenerationService, probe_molecule, submit


def test_warm_classes_grouping():
    """warm_classes groups by (bucket, tight-capacity) and keeps the
    largest molecule per class."""
    from agdiff_tpu.serve.server import warm_classes

    class FakeRunner:
        use_fast = True
        engine = None
        buckets = (32, 64)
        _tight_shared = True
        model_config = None
        _bucket_for = GenerationRunner._bucket_for
        _capacity_for = GenerationRunner._capacity_for
        _engine_for = GenerationRunner._engine_for

    mols = [probe_molecule(n) for n in (10, 20, 40, 48, 60)]
    classes = warm_classes(FakeRunner(), mols)
    # 10/20 -> bucket 32 (fast-xla, cap None); 40/48/60 -> bucket 64 tight,
    # capacities 1024 (40: 780 pairs), 1280 (48: 1128), 1792 (60: 1770)
    assert (32, None) in classes
    assert classes[(32, None)].num_nodes == 20
    tight_keys = [k for k in classes if k[0] == 64]
    assert len(tight_keys) == 3
    for (b, cap), m in classes.items():
        if cap is not None:
            assert cap >= m.num_nodes * (m.num_nodes - 1) // 2


def test_probe_molecule_shapes():
    m = probe_molecule(24)
    assert len(m.atom_type) == 24
    assert m.bond_index.shape == (2, 2 * 23)
    d = np.linalg.norm(m.pos[m.bond_index[0]] - m.pos[m.bond_index[1]],
                       axis=-1)
    np.testing.assert_allclose(d, 1.52, atol=1e-5)


@pytest.fixture(scope="module")
def service():
    from agdiff_tpu import Config, ModelConfig

    cfg = Config(model=ModelConfig(hidden_dim=32, num_convs=2,
                                   num_convs_local=2,
                                   num_diffusion_timesteps=100))
    mols = synthetic_dataset(1, seed=9, min_heavy=3, max_heavy=3)
    batch = pad_molecules(mols, 16, batch_size=1)
    model = get_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    runner = GenerationRunner(
        model, variables, make_diffusion(cfg.model),
        SamplerConfig(n_steps=6), buckets=(16,), chunk_size=8,
        use_fast=True, model_config=cfg.model,
    )
    svc = GenerationService(runner)
    port_box = []
    ready = threading.Event()

    def _ready(p):
        port_box.append(p)
        ready.set()

    t = threading.Thread(
        target=svc.serve, kwargs=dict(port=0, ready_callback=_ready),
        daemon=True,
    )
    t.start()
    assert ready.wait(10)
    yield svc, port_box[0]
    try:
        submit({"cmd": "shutdown"}, port=port_box[0], timeout=5)
    except OSError:
        pass
    t.join(timeout=10)


def test_service_lifecycle(service, tmp_path):
    svc, port = service

    r = submit({"cmd": "ping"}, port=port, timeout=10)
    assert r["ok"] and r["requests"] >= 1

    r = submit({"cmd": "warm", "nodes": [12], "num_samples": 8,
                "retry": True}, port=port, timeout=300)
    assert r["ok"]
    assert [16, 8, False] in r["compiled"] and [16, 8, True] in r["compiled"]

    r = submit({"cmd": "ping"}, port=port, timeout=10)
    programs_after_warm = r["cached_programs"]
    assert programs_after_warm >= 2

    gen_req = {
        "cmd": "generate", "synthetic": 2, "synthetic_seed": 7,
        "num_conformers": 2, "num_confs": "2x", "seed": 1,
        "out_dir": str(tmp_path / "g1"), "resume": False,
    }
    r1 = submit(gen_req, port=port, timeout=600)
    assert r1["ok"] and r1["molecules"] == 2 and r1["samples"] == 8
    programs_after_gen = submit({"cmd": "ping"}, port=port,
                                timeout=10)["cached_programs"]

    # second request: compiled-program cache is reused, no new programs
    r2 = submit({**gen_req, "out_dir": str(tmp_path / "g2")},
                port=port, timeout=600)
    assert r2["ok"]
    r = submit({"cmd": "ping"}, port=port, timeout=10)
    assert r["cached_programs"] == programs_after_gen

    # determinism across requests (same seed -> same samples)
    from agdiff_tpu.eval.generate import load_samples

    a = load_samples(str(tmp_path / "g1" / "samples_all.npz"))
    b = load_samples(str(tmp_path / "g2" / "samples_all.npz"))
    for x, y in zip(a, b):
        np.testing.assert_allclose(x.meta["pos_gen"], y.meta["pos_gen"],
                                   atol=1e-5)

    # evaluate the generated samples through the service
    r = submit({"cmd": "evaluate",
                "samples": str(tmp_path / "g1" / "samples_all.npz"),
                "num_workers": 0},
               port=port, timeout=300)
    assert r["ok"] and r["molecules"] == 2
    assert np.isfinite(r["MAT-R_mean"]) and r["MAT-R_mean"] > 0


def test_inline_generation(service, tmp_path):
    """save=false + return_pos=true: the whole request stays in memory and
    the reply inlines the conformers; results match a saved run with the
    same seed."""
    svc, port = service
    base = {
        "cmd": "generate", "synthetic": 2, "synthetic_seed": 7,
        "num_conformers": 2, "num_confs": 2, "seed": 4, "resume": False,
    }
    r = submit({**base, "save": False, "return_pos": True},
               port=port, timeout=600)
    assert r["ok"] and r["molecules"] == 2 and r["samples"] == 4
    assert "out" not in r
    pos = r["pos"]
    assert len(pos) == 2
    r2 = submit({**base, "out_dir": str(tmp_path / "disk")},
                port=port, timeout=600)
    assert r2["ok"]
    from agdiff_tpu.eval.generate import load_samples

    saved = load_samples(str(tmp_path / "disk" / "samples_all.npz"))
    for inline, mol in zip(pos, saved):
        np.testing.assert_allclose(
            np.asarray(inline, np.float32), mol.meta["pos_gen"], atol=1e-5)


def test_service_error_paths(service):
    _, port = service
    r = submit({"cmd": "nope"}, port=port, timeout=10)
    assert not r["ok"] and "unknown cmd" in r["error"]
    r = submit({"cmd": "generate", "out_dir": "/tmp/x"}, port=port,
               timeout=10)
    assert not r["ok"] and "test_set" in r["error"]
    # a failed request must not kill the server
    assert submit({"cmd": "ping"}, port=port, timeout=10)["ok"]


def test_warm_all_sizes_covers_every_bucket_capacity(monkeypatch):
    """Under dynamic batching, warm(all_sizes=True) must compile a tight
    program for EVERY pair capacity the bucket can emit, not just the probe
    molecule's: tight programs are keyed by capacity (256-multiples of the
    molecule's N(N-1)/2), so a same-bucket molecule with a different atom
    count would otherwise compile cold mid-request (measured 7-40 s stalls
    in the round-4 serving soak)."""
    from agdiff_tpu import Config, ModelConfig
    from agdiff_tpu.models.tight_forward import pair_capacity_for

    # bf16 compute -> the auto-selected engine is the narrow-storage
    # production default (tight-slim); the warm sweep must key on it
    cfg = Config(model=ModelConfig(hidden_dim=32, num_convs=2,
                                   num_convs_local=2,
                                   num_diffusion_timesteps=50,
                                   dtype="bfloat16"))
    mols = synthetic_dataset(1, seed=9, min_heavy=3, max_heavy=3)
    batch = pad_molecules(mols, 16, batch_size=1)
    model = get_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    runner = GenerationRunner(
        model, variables, make_diffusion(cfg.model),
        SamplerConfig(n_steps=4), buckets=(16, 48), chunk_size=8,
        use_fast=True, model_config=cfg.model,
    )

    warmed = []

    class _Stub:
        def warm(self, *a, **k):
            return True

    def fake_sampler(bucket, retry, capacity=None, engine=None):
        warmed.append((bucket, retry, capacity, engine))
        return _Stub()

    monkeypatch.setattr(runner, "_sampler", fake_sampler)
    probe = probe_molecule(48)
    runner.warm(probe, retry=False, all_sizes=True)

    expected = {pair_capacity_for(n, multiple=256) for n in range(17, 49)}
    got = {cap for (_, _, cap, eng) in warmed if eng == "tight-slim"}
    assert got == expected, (got, expected)
    # the probe's own capacity is among them
    assert pair_capacity_for(48, multiple=256) in got
    # without all_sizes only the probe's capacity is compiled
    warmed.clear()
    runner.warm(probe, retry=False, all_sizes=False)
    assert {cap for (_, _, cap, _) in warmed} == {
        pair_capacity_for(48, multiple=256)}
