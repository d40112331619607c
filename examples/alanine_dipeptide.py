"""Alanine dipeptide conformer generation example.

Equivalent of the reference examples/test_alanine_dipeptide.py: build the
ACE-ALA-NME molecule, run the Langevin sampler on a (QM9-trained) checkpoint,
compute heavy-atom RMSD vs the starting structure, and export the sampled
ensemble. Differences from the reference:
  * the molecule is built natively (z-matrix/NeRF construction below) or
    from any PDB file (--pdb, parsed by agdiff_tpu.chem.pdb — no mdtraj);
  * the sampled ensemble is written as a multi-MODEL PDB (and DCD if mdtraj
    happens to be installed), instead of requiring mdtraj.

Usage:
  python examples/alanine_dipeptide.py <ckpt_or_logdir> [--pdb file.pdb]
      [--num_samples 250] [--n_steps 5000] [--out out_dir]
  python examples/alanine_dipeptide.py --build-only   # just write the PDB
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from agdiff_tpu.chem.constants import BondType
from agdiff_tpu.chem.mol import Molecule
from agdiff_tpu.chem.pdb import perceive_bonds, write_pdb
from agdiff_tpu.chem.rmsd import kabsch_rmsd


def _nerf(a, b, c, bond, angle, dihedral):
    """Place atom d given three reference atoms (natural extension reference
    frame): |cd| = bond, angle(b,c,d), dihedral(a,b,c,d) in degrees."""
    angle = np.deg2rad(angle)
    dihedral = np.deg2rad(dihedral)
    bc = c - b
    bc /= np.linalg.norm(bc)
    ab = b - a
    n = np.cross(ab, bc)
    n /= np.linalg.norm(n)
    m = np.cross(n, bc)
    d_local = bond * np.array(
        [-np.cos(angle), np.sin(angle) * np.cos(dihedral),
         np.sin(angle) * np.sin(dihedral)]
    )
    return c + d_local[0] * bc + d_local[1] * m + d_local[2] * n


def build_alanine_dipeptide(phi=-80.0, psi=-60.0) -> Molecule:
    """ACE-ALA-NME (22 atoms) from standard internal coordinates."""
    P = {}
    P["CH3A"] = np.array([0.0, 0.0, 0.0])
    P["CA0"] = np.array([1.52, 0.0, 0.0])  # ACE carbonyl C
    P["O0"] = _nerf(P["CH3A"] + [0, 1, 0], P["CH3A"], P["CA0"], 1.23, 121, 0)
    P["N1"] = _nerf(P["O0"], P["CH3A"], P["CA0"], 1.33, 116, 180)
    P["CA1"] = _nerf(P["CH3A"], P["CA0"], P["N1"], 1.46, 122, 180)
    P["CB1"] = _nerf(P["CA0"], P["N1"], P["CA1"], 1.52, 110, phi + 120)
    P["C1"] = _nerf(P["CA0"], P["N1"], P["CA1"], 1.52, 110, phi)
    P["O1"] = _nerf(P["N1"], P["CA1"], P["C1"], 1.23, 121, psi + 180)
    P["N2"] = _nerf(P["N1"], P["CA1"], P["C1"], 1.33, 116, psi)
    P["CH3B"] = _nerf(P["CA1"], P["C1"], P["N2"], 1.46, 122, 180)
    # hydrogens
    P["H1A"] = _nerf(P["O0"], P["CA0"], P["CH3A"], 1.09, 109.5, 60)
    P["H2A"] = _nerf(P["O0"], P["CA0"], P["CH3A"], 1.09, 109.5, 180)
    P["H3A"] = _nerf(P["O0"], P["CA0"], P["CH3A"], 1.09, 109.5, 300)
    P["HN1"] = _nerf(P["CA1"], P["CA0"], P["N1"], 1.01, 119, 180)
    P["HA1"] = _nerf(P["CA0"], P["N1"], P["CA1"], 1.09, 109, phi + 240)
    P["HB1"] = _nerf(P["N1"], P["CA1"], P["CB1"], 1.09, 109.5, 60)
    P["HB2"] = _nerf(P["N1"], P["CA1"], P["CB1"], 1.09, 109.5, 180)
    P["HB3"] = _nerf(P["N1"], P["CA1"], P["CB1"], 1.09, 109.5, 300)
    P["HN2"] = _nerf(P["CA1"], P["C1"], P["N2"], 1.01, 119, 0)
    P["H1B"] = _nerf(P["C1"], P["N2"], P["CH3B"], 1.09, 109.5, 60)
    P["H2B"] = _nerf(P["C1"], P["N2"], P["CH3B"], 1.09, 109.5, 180)
    P["H3B"] = _nerf(P["C1"], P["N2"], P["CH3B"], 1.09, 109.5, 300)

    order = [
        "CH3A", "H1A", "H2A", "H3A", "CA0", "O0", "N1", "HN1", "CA1", "HA1",
        "CB1", "HB1", "HB2", "HB3", "C1", "O1", "N2", "HN2", "CH3B", "H1B",
        "H2B", "H3B",
    ]
    z_of = {"C": 6, "O": 8, "N": 7, "H": 1}
    # names starting with H are hydrogens; others map by first letter
    atom_type = np.array(
        [1 if name.startswith("H") else z_of[name[0]] for name in order],
        np.int32,
    )
    pos = np.array([P[name] for name in order], np.float32)
    bonds = perceive_bonds(atom_type, pos)
    src, dst = [], []
    for i, j in sorted(bonds):
        src += [i, j]
        dst += [j, i]
    perm = np.argsort(np.array(src) * len(order) + np.array(dst))
    return Molecule(
        atom_type=atom_type,
        pos=pos - pos.mean(0),
        bond_index=np.stack([np.array(src)[perm], np.array(dst)[perm]]),
        bond_type=np.full(len(src), int(BondType.SINGLE), np.int32),
        smiles="CC(=O)NC(C)C(=O)NC",
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", help="log dir or checkpoint")
    ap.add_argument("--pdb", default=None, help="use this PDB instead")
    ap.add_argument("--num_samples", type=int, default=250)
    ap.add_argument("--n_steps", type=int, default=5000)
    ap.add_argument("--w_global", type=float, default=0.3)
    ap.add_argument("--clip_local", type=float, default=20.0)
    ap.add_argument("--out", default="./alanine_out")
    ap.add_argument("--build-only", action="store_true")
    args = ap.parse_args(argv)

    if args.pdb:
        from agdiff_tpu.chem.pdb import load_pdb

        mol, _ = load_pdb(args.pdb)
    else:
        mol = build_alanine_dipeptide()
    print(f"alanine dipeptide: {mol.num_nodes} atoms, "
          f"{mol.bond_index.shape[1] // 2} bonds")
    os.makedirs(args.out, exist_ok=True)
    write_pdb(os.path.join(args.out, "input.pdb"), mol, mol.pos)
    if args.build_only:
        return

    import jax

    from agdiff_tpu.eval.generate import GenerationRunner
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.sampling.langevin import SamplerConfig
    from agdiff_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    if os.path.isdir(os.path.join(args.ckpt, "checkpoints")):
        ckpt_path, _ = latest_checkpoint(args.ckpt)
    else:
        ckpt_path = args.ckpt
    ckpt = load_checkpoint(ckpt_path)
    model = get_model(ckpt["config"].model)
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    runner = GenerationRunner(
        model, variables, make_diffusion(ckpt["config"].model),
        SamplerConfig(n_steps=args.n_steps, w_global=args.w_global,
                      clip_local=args.clip_local),
        buckets=(32,), chunk_size=50,
    )
    pos_gen = runner.generate_molecule(
        mol, args.num_samples, jax.random.PRNGKey(0)
    )

    heavy = mol.atom_type != 1
    rmsds = [
        kabsch_rmsd(mol.pos[heavy], p[heavy]) for p in pos_gen
    ]
    print(f"heavy-atom RMSD vs input: mean {np.mean(rmsds):.3f} A, "
          f"min {np.min(rmsds):.3f} A, max {np.max(rmsds):.3f} A")
    write_pdb(os.path.join(args.out, "samples.pdb"), mol, pos_gen)
    np.savez(os.path.join(args.out, "samples.npz"), pos_gen=pos_gen,
             rmsd=np.array(rmsds))
    print(f"wrote {args.num_samples} models -> {args.out}/samples.pdb")


if __name__ == "__main__":
    main()
