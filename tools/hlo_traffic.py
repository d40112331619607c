"""Per-fusion HBM-traffic breakdown of the sampler step.

tools/roofline.py settled WHETHER the step is memory-bound (it is: the HLO
byte upper bound exceeds the measured step at both operating points). This
tool answers WHERE the bytes go: it compiles the ladder AOT, takes the
optimized HLO (`compiled.as_text()`), finds the scan's while-body
computation, and for every top-level instruction sums

    bytes(instruction) = size(result) + sum(size(operands))

— fusion boundaries in optimized HLO are exactly the materialization
points, so ranking instructions by this count names the buffers that
round-trip HBM each step. Results are grouped two ways:

  * top instructions (with their jax op_name metadata, so each row points
    at a line of model code), and
  * totals by result shape — "how much of the step's traffic is
    (B, N, N, F) dense mirrors vs (B, P, F) packed tensors vs weights".

Same caveat as the roofline: this is an UPPER bound per instruction (an
operand consumed by two fusions is counted twice even if it stays in
cache), but relative ranking is what we act on.

Usage (TPU; compile is AOT so warm-cache runs are quick):
  python tools/hlo_traffic.py --engine fast-slim
  python tools/hlo_traffic.py --engine fast-tight-slim --nodes 64 \
      --batch 48 --heavy 20
"""

import argparse
import collections
import json
import re
import sys

sys.path.insert(0, "/root/repo")

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1, "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    """Total bytes of every array shape mentioned in `text` (handles
    tuples by summing their elements)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


# zero-cost ops: no data movement (aliasing / tuple plumbing)
_FREE_OPS = {"bitcast", "tuple", "get-tuple-element", "parameter",
             "constant", "after-all", "iota"}

_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^=]*?\)|[a-z0-9]+\[[0-9,]*\]"
    r"(?:\{[^}]*\})?)\s*([\w\-]+)\((.*)$"
)
_OPERAND_RE = re.compile(r"%([\w.\-]+)")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def parse_computation(lines):
    """Parse one HLO computation body -> list of instruction dicts."""
    instrs = {}
    rows = []
    for ln in lines:
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        name, shape, op, rest = m.groups()
        # operands are the %refs before any `, calls=`/metadata section;
        # cheap approximation: take refs in the parenthesized arg list only
        depth, i, args = 1, 0, ""
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            args += ch if depth >= 1 else ""
        operands = _OPERAND_RE.findall(args)
        opname = _OPNAME_RE.search(ln)
        row = dict(name=name, shape=shape, op=op, operands=operands,
                   op_name=opname.group(1) if opname else "")
        instrs[name] = row
        rows.append(row)
    for row in rows:
        if row["op"] in _FREE_OPS:
            row["out_bytes"] = row["in_bytes"] = row["bytes"] = 0
            continue
        out_b = shape_bytes(row["shape"])
        in_b = 0
        for o in row["operands"]:
            src = instrs.get(o)
            if src is not None:
                in_b += shape_bytes(src["shape"])
        row["out_bytes"] = out_b
        row["in_bytes"] = in_b
        row["bytes"] = out_b + in_b
    return rows


def split_computations(hlo_text: str):
    """Yield (header_line, body_lines) per computation in the module."""
    comps = []
    cur_header, cur_lines = None, []
    for ln in hlo_text.splitlines():
        if ln.startswith(("ENTRY ", "%")) and ln.rstrip().endswith("{"):
            if cur_header is not None:
                comps.append((cur_header, cur_lines))
            cur_header, cur_lines = ln, []
        elif ln.startswith("}"):
            if cur_header is not None:
                comps.append((cur_header, cur_lines))
            cur_header, cur_lines = None, []
        elif cur_header is not None:
            cur_lines.append(ln)
    return comps


def main():
    from agdiff_tpu.cli._common import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="fast-slim")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=32)
    ap.add_argument("--heavy", type=int, default=9)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dump", default=None,
                    help="also write the full optimized HLO text here")
    args = ap.parse_args()

    import jax

    from agdiff_tpu.config import ModelConfig
    from agdiff_tpu.data.bucketing import pad_molecules
    from agdiff_tpu.data.synthetic import synthetic_dataset
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.models.tight_forward import pair_capacity_for
    from agdiff_tpu.sampling import SamplerConfig
    from agdiff_tpu.sampling.langevin import build_fast_sampler

    config = ModelConfig(dtype=args.dtype)
    model = get_model(config)
    diffusion = make_diffusion(config)
    mols = synthetic_dataset(1, seed=0, min_heavy=args.heavy,
                             max_heavy=args.heavy)
    batch = pad_molecules(mols * args.batch, max_nodes=args.nodes,
                          edge_order=3, batch_size=args.batch)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    scfg = SamplerConfig(n_steps=args.steps, ladder="suffix", w_global=0.3,
                         global_start_sigma=0.5, clip_local=20.0)
    pos_init = jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape)
    key = jax.random.PRNGKey(2)

    engine = {"fast-xla": None, "fast-stack": "stack",
              "fast-tight": "tight", "fast-slim": "slim",
              "fast-slim8": "slim8", "fast-tight-slim": "tight-slim",
              "fast-tight-slim8": "tight-slim8", "fast-pk": "pk",
              "fast-pks": "pks", "fast-pksg": "pksg",
              "fast-pksf": "pksf", "fast-tight-pks": "tight-pks",
              "fast-tight-pksg": "tight-pksg",
              "fast-tight-pksf": "tight-pksf"}[args.engine]
    tightish = bool(engine) and engine.startswith("tight")
    cap = pair_capacity_for(len(mols[0].atom_type)) if tightish else None
    fn = build_fast_sampler(config, variables, diffusion, scfg,
                            engine=engine, pair_capacity=cap,
                            shared_pairs=tightish)
    compiled = fn.lower(batch, pos_init, key).compile()
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)

    comps = split_computations(hlo)
    # the scan body is the biggest non-fused computation mentioning a
    # while-op body (heuristic: largest computation by instruction count
    # whose header is not a fused_computation)
    candidates = [(h, b) for h, b in comps
                  if "fused_computation" not in h.split("(")[0]]
    header, body = max(candidates, key=lambda hb: len(hb[1]))
    rows = parse_computation(body)
    total = sum(r["bytes"] for r in rows)

    def short(s, n=110):
        return s if len(s) <= n else s[: n - 3] + "..."

    print(json.dumps({
        "engine": args.engine, "batch": args.batch, "nodes": args.nodes,
        "heavy": args.heavy, "dtype": args.dtype,
        "body": header.split("{")[0].strip(),
        "instructions": len(rows),
        "total_gb_per_step": round(total / 1e9, 4),
    }))
    top = sorted(rows, key=lambda r: -r["bytes"])[: args.top]
    for r in top:
        print(json.dumps({
            "mb": round(r["bytes"] / 1e6, 2),
            "out_mb": round(r["out_bytes"] / 1e6, 2),
            "op": r["op"],
            "shape": r["shape"].split("{")[0],
            "name": r["name"],
            "src": short(r["op_name"]),
        }))

    by_shape = collections.Counter()
    for r in rows:
        by_shape[r["shape"].split("{")[0]] += r["out_bytes"]
    print("--- output bytes by result shape (top 15) ---")
    for shape, b in by_shape.most_common(15):
        print(json.dumps({"shape": shape, "total_out_mb": round(b / 1e6, 2)}))


if __name__ == "__main__":
    main()
