"""Dynamic request batching: concurrent generate requests merge into one
packed run; per-request PRNG (item_seeds) makes each request's samples
independent of co-batched traffic. With a deterministic sampler (DDIM
eta=0) batched results must be BIT-equal to the same request served solo."""

import threading

import jax
import numpy as np
import pytest

from agdiff_tpu import Config, ModelConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.eval.generate import GenerationRunner, PackedGenerationRunner
from agdiff_tpu.models.dualenc import get_model
from agdiff_tpu.models.schedules import make_diffusion
from agdiff_tpu.sampling import SamplerConfig
from agdiff_tpu.serve.server import GenerationService, submit


def _runner(cls):
    cfg = Config(model=ModelConfig(hidden_dim=32, num_convs=2,
                                   num_convs_local=2,
                                   num_diffusion_timesteps=100))
    mols = synthetic_dataset(1, seed=9, min_heavy=3, max_heavy=3)
    batch = pad_molecules(mols, 16, batch_size=1)
    model = get_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    # deterministic few-step DDIM: co-batching invariance is bit-testable
    scfg = SamplerConfig(n_steps=4, ladder="strided",
                         sampling_type="generalized", eta=0.0)
    return cls(model, variables, make_diffusion(cfg.model), scfg,
               buckets=(16,), chunk_size=8, use_fast=True,
               model_config=cfg.model)


def test_batching_requires_packed_runner():
    with pytest.raises(ValueError, match="PackedGenerationRunner"):
        GenerationService(_runner(GenerationRunner), batch_window_s=0.5)


@pytest.fixture(scope="module")
def batched_service():
    svc = GenerationService(_runner(PackedGenerationRunner),
                            batch_window_s=0.8, max_nodes=24)
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
    t.join(timeout=30)


def _gen_req(seed, n_mols=2):
    return {
        "cmd": "generate", "synthetic": n_mols, "synthetic_seed": 7,
        "num_conformers": 2, "num_confs": 2, "seed": seed,
        "save": False, "return_pos": True, "resume": False,
    }


def test_concurrent_requests_are_merged_and_co_batch_invariant(
        batched_service):
    svc, port = batched_service
    # solo baselines first (batch: false bypasses the window entirely)
    solo = {}
    for seed in (1, 2, 3):
        r = submit({**_gen_req(seed), "batch": False}, port=port,
                   timeout=600)
        assert r["ok"] and "batched_with" not in r
        solo[seed] = r["pos"]

    # now fire the same three requests concurrently
    replies = {}

    def _client(seed):
        replies[seed] = submit(_gen_req(seed), port=port, timeout=600)

    threads = [threading.Thread(target=_client, args=(s,))
               for s in (1, 2, 3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)

    merged_counts = set()
    for seed in (1, 2, 3):
        r = replies[seed]
        assert r["ok"] and r["molecules"] == 2 and r["samples"] == 4
        merged_counts.add(r["batched_with"])
        # bit-equal to the solo run: item_seeds made the request's samples
        # a pure function of its own seed (deterministic eta=0 sampler)
        for got, want in zip(r["pos"], solo[seed]):
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(want, np.float32),
                                       atol=1e-6)
    # at least two of the three rode in one merged batch
    assert max(merged_counts) >= 1


def test_over_capacity_request_rejected_cleanly(batched_service):
    """A molecule larger than the server's --max_nodes capacity must be
    REJECTED with {"ok": false} before any device work — never silently
    compiled into a new mid-request ladder program, and never allowed near
    the tight engine's pair-truncation hazard (sampling/langevin.py). A
    co-batched in-capacity request must be unaffected."""
    svc, port = batched_service
    replies = {}

    def _client(name, req):
        replies[name] = submit(req, port=port, timeout=600)

    # 20 heavy atoms + hydrogens (48 total) >> the 24-atom capacity
    over = {**_gen_req(11), "synthetic": 1, "synthetic_heavy": 20}
    threads = [
        threading.Thread(target=_client, args=("over", over)),
        threading.Thread(target=_client, args=("ok", _gen_req(12))),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert replies["over"]["ok"] is False
    assert "server capacity 24" in replies["over"]["error"]
    # structured policy rejection: one-line message + rejected marker,
    # NOT a traceback (clients must be able to tell policy from failure)
    assert replies["over"]["rejected"] == "over_capacity"
    assert "Traceback" not in replies["over"]["error"]
    assert replies["ok"]["ok"] is True and replies["ok"]["samples"] == 4

    # solo (unbatched) path rejects identically
    r = submit({**over, "batch": False}, port=port, timeout=600)
    assert r["ok"] is False and "server capacity 24" in r["error"]
    assert r["rejected"] == "over_capacity" and "Traceback" not in r["error"]


def test_batched_request_can_save(batched_service, tmp_path):
    svc, port = batched_service
    out = tmp_path / "batched"
    r = submit({**_gen_req(5), "save": True, "return_pos": False,
                "out_dir": str(out)}, port=port, timeout=600)
    assert r["ok"] and r["out"].endswith("samples_all.npz")
    from agdiff_tpu.eval.generate import load_samples

    mols = load_samples(str(out / "samples_all.npz"))
    assert len(mols) == 2
    for m in mols:
        assert np.asarray(m.meta["pos_gen"]).shape[0] == 2
