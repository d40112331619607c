"""Verify drive (see .claude/skills/verify): dataset -> train -> sample ->
eval on local CPU, plus a 100-step ladder through the current default
engines (pksf / tight-pksf, interpret mode) checked against the module
path trajectory. Run: python tools/verify_drive.py"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from agdiff_tpu import Config, ModelConfig, TrainConfig  # noqa: E402
from agdiff_tpu.chem import best_rmsd  # noqa: E402
from agdiff_tpu.data import pad_molecules, synthetic_dataset  # noqa: E402
from agdiff_tpu.models import make_diffusion  # noqa: E402
from agdiff_tpu.models.dualenc import get_model  # noqa: E402
from agdiff_tpu.models.tight_forward import pair_capacity_for  # noqa: E402
from agdiff_tpu.sampling import SamplerConfig, build_sampler  # noqa: E402
from agdiff_tpu.sampling.langevin import build_fast_sampler  # noqa: E402
from agdiff_tpu.train import create_train_state, make_train_step  # noqa: E402


def main():
    cfg = Config(model=ModelConfig(hidden_dim=32, num_convs=2,
                                   num_convs_local=2,
                                   num_diffusion_timesteps=100),
                 train=TrainConfig(batch_size=8))
    mols = synthetic_dataset(8, seed=0, min_heavy=4, max_heavy=6)
    batch = pad_molecules(mols, max_nodes=24, edge_order=3, batch_size=8)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), 24, 8)
    step = make_train_step(model, cfg)
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(40):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        losses.append(float(metrics.loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    print("train OK:", losses[0], "->", losses[-1])

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    diffusion = make_diffusion(cfg.model)
    scfg = SamplerConfig(n_steps=100)
    sampler = build_sampler(model, diffusion, scfg)
    mol = mols[0]
    b1 = pad_molecules([mol] * 4, max_nodes=24, edge_order=3, batch_size=4)
    pos_init = jax.random.normal(jax.random.PRNGKey(5), b1.pos.shape)
    out = sampler(variables, b1, pos_init, jax.random.PRNGKey(6))
    r = best_rmsd(mol, np.asarray(mol.pos),
                  np.asarray(out.pos[0][:mol.num_nodes]))
    print("module sampler OK, RMSD", r)
    assert np.isfinite(r)

    from agdiff_tpu.ops.pallas import stack_packed

    stack_packed._INTERPRET = True
    for eng, shared in [("pksf", False), ("tight-pksf", True)]:
        fast = build_fast_sampler(
            cfg.model, variables, diffusion, scfg, engine=eng,
            pair_capacity=(pair_capacity_for(mol.num_nodes)
                           if shared else None),
            shared_pairs=shared, store_dtype=jax.numpy.float32)
        out2 = fast(b1, pos_init, jax.random.PRNGKey(6))
        d = float(np.abs(np.asarray(out2.pos) - np.asarray(out.pos)).max())
        print(eng, "trajectory max|delta| vs module:", d)
        assert d < 1e-3, (eng, d)
        assert not bool(np.asarray(out2.nan_flags).any())
    print("VERIFY OK")


if __name__ == "__main__":
    main()
