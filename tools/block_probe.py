"""Per-block roofline probe for the SchNet interaction stack.

The measured step floor is ~2.4 ms (bf16, B=128, N=32), of which the 6
SchNet blocks are 1.68 ms (~0.28 ms/block). The round-3 identity-activation
bound showed the XLA path is NOT transcendental-bound — so where does a
block's 0.28 ms go, and what is its speed of light?

Arithmetic at B=128, N=32, C=F=128 per dual-pathway block:
  - one bf16 (B,N,N,C) tensor = 33.5 MB -> one HBM pass ~= 41 us at v5e's
    ~820 GB/s.  An ideal fused block reads edge_attr ONCE (+ writes only
    (B,N,F)): ~45 us.
  - XLA materializes the filter tensors between/after the matmuls: ~3
    passes per pathway -> ~250 us/block, matching the measurement ->
    bandwidth-bound.
  - inside a VMEM-resident kernel the bound flips to VPU: exact softplus
    (~10+ elementwise f32 ops on 16.8M elements/pathway) ~= 45 us/pathway,
    + the f32 scale-and-reduce. This is why the existing fused kernel only
    broke even: it trades HBM passes for exposed VPU work.
  - the polynomial softplus (ops/approx.py, ~12 cheap FMA-class ops, no
    exp/log) was a WASH in XLA (hidden by bandwidth) but attacks exactly
    the exposed VPU bound in the kernel.

This probe measures, in ONE process on the chip, a 6-block stack driven by
a lax.scan (dispatch amortized), per scan iteration recomputing the edge
tensor (2 HBM passes, identical across variants, subtracted via the
'none' variant):

  none         scaffold only (e recompute + carry update)     -> overhead
  read         blocks replaced by a single e read each        -> bandwidth
                                                                 speed of light
  xla          the production dual-pathway XLA block (fast_forward's
               cf_pathway_xla structure)
  pallas       ops/pallas/fused.interaction_block_aggregate (exact softplus)
  pallas-approx  same kernel with the polynomial softplus in-kernel

Usage:  python tools/block_probe.py [--batch 128] [--nodes 32] [--iters 400]
        [--variants none,read,xla,pallas,pallas-approx] [--group 8]
Emits one JSON line with us/block for each variant.
"""

import argparse
import functools
import json
import time
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=32)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--group", type=int, default=None,
                    help="pallas graphs-per-program override")
    ap.add_argument("--variants",
                    default="none,read,xla,pallas,pallas-approx")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from agdiff_tpu.cli._common import enable_compilation_cache

        enable_compilation_cache()
    import jax.numpy as jnp

    from agdiff_tpu.ops import approx
    from agdiff_tpu.ops.pallas import fused

    if args.cpu:
        fused._INTERPRET = True  # pallas in interpret mode off-TPU

    B, N, F = args.batch, args.nodes, args.feat
    NB = args.blocks
    group = args.group or fused.DEFAULT_GROUP
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    e0 = jax.random.normal(ks[0], (B, N, N, F), jnp.bfloat16) * 0.1
    w_edge = jax.nn.sigmoid(jax.random.normal(ks[1], (B, N, N)))
    h1_0 = jax.random.normal(ks[2], (B, N, F), jnp.float32) * 0.1
    h2_0 = jax.random.normal(ks[3], (B, N, F), jnp.float32) * 0.1

    def mk_conv(k):
        ka, kb = jax.random.split(k)
        s = (2.0 / F) ** 0.5
        return {
            "fa": (jax.random.normal(ka, (F, F), jnp.bfloat16) * s,
                   jnp.zeros((F,), jnp.float32)),
            "fb": (jax.random.normal(kb, (F, F), jnp.bfloat16) * s,
                   jnp.zeros((F,), jnp.float32)),
            "beta": jnp.ones((), jnp.float32),
            "dw1": (jax.random.normal(jax.random.fold_in(ka, 1), (1, 64),
                                      jnp.float32),
                    jnp.zeros((64,), jnp.float32)),
            "dw2": (jax.random.normal(jax.random.fold_in(kb, 1), (64, 1),
                                      jnp.float32) * 0.1,
                    jnp.zeros((1,), jnp.float32)),
        }

    convs = [(mk_conv(jax.random.fold_in(ks[4], i)),
              mk_conv(jax.random.fold_in(ks[5], i))) for i in range(NB)]

    LN2 = 0.6931471805599453

    def xla_pathway(e, conv, h):
        # mirrors models/fast_forward.cf_pathway_xla (minus the cheap
        # per-edge scalar net, identical across variants via w_edge)
        w = jnp.matmul(e, conv["fa"][0],
                       preferred_element_type=jnp.float32) + conv["fa"][1]
        w = jax.nn.softplus(conv["beta"] * w) - LN2
        w = (jnp.matmul(w.astype(e.dtype), conv["fb"][0],
                        preferred_element_type=jnp.float32)
             + conv["fb"][1]) * w_edge[..., None]
        return jnp.einsum("bijf,bjf->bif", w, h)

    def block_xla(e, c1, c2, h1, h2):
        return xla_pathway(e, c1, h1), xla_pathway(e, c2, h2)

    def block_read(e, c1, c2, h1, h2):
        # one pass over e per block: the bandwidth speed of light for any
        # fused implementation (plus its tiny (B,N,F) output write)
        o = jnp.einsum("bijf,bjf->bif", e.astype(jnp.float32), h1)
        return o, o

    def mk_block_pallas(softplus_fn):
        def block(e, c1, c2, h1, h2):
            return fused.interaction_block_aggregate(
                e, w_edge, w_edge, h1, h2, c1, c2, group=group,
                softplus_fn=softplus_fn)
        return block

    # --- packed-kernel (ops/pallas/block_packed) variants -----------------
    import numpy as np

    from agdiff_tpu.ops.pallas import block_packed

    if args.cpu:
        block_packed._INTERPRET = True
    iu, ju = np.triu_indices(N, k=1)
    P = len(iu)
    e0p = e0[:, iu, ju, :]                                   # (B, P, F)
    el_p = jnp.abs(jax.random.normal(ks[6], (B, P), jnp.float32)) + 0.5
    env_p = jax.nn.sigmoid(jax.random.normal(ks[7], (B, P)))

    def mk_block_pk(ablate=None):
        """full kernel, or an ablated probe-local copy of its body:
        noagg (skip the per-graph endpoint dots), nomlp (skip the filter
        MLPs). The per-pair scalar planes (distance weight x envelope x
        mask) come from XLA like production (in-kernel dw measured +129
        us/block, round-4 pk-nodw ablation)."""
        if ablate is None:
            def block(e_p, c1, c2, h1, h2):
                return block_packed.packed_block_aggregate(
                    e_p, env_p, env_p, h1, h2, c1, c2, group=group)
            return block

        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(ep_ref, we1_ref, we2_ref, x1_ref, x2_ref,
                 exp_ref, con_ref,
                 fa1, ba1, fb1, bb1, fa2, ba2, fb2, bb2,
                 scalars_ref, out1_ref, out2_ref, *, g, p, c):
            ep = ep_ref[:].reshape(g * p, c)
            e_exp, e_con = exp_ref[:], con_ref[:]

            def pathway(we_ref, fa, ba, beta, fb, bb, x_ref, out_ref):
                if ablate == "nomlp":
                    t = ep.reshape(g, p, c)[..., :fb[:].shape[1]].astype(
                        jnp.float32)
                else:
                    v = jnp.dot(ep, fa[:].astype(ep.dtype),
                                preferred_element_type=jnp.float32) + ba[:]
                    v = jax.nn.softplus(beta * v) - 0.6931471805599453
                    t = jnp.dot(v.astype(ep.dtype), fb[:].astype(ep.dtype),
                                preferred_element_type=jnp.float32) + bb[:]
                    t = t.reshape(g, p, t.shape[-1])
                t = t * we_ref[:][..., None]
                if ablate == "noagg":
                    out_ref[:] = jnp.broadcast_to(
                        jnp.sum(t, axis=1)[:, None, :], out_ref.shape)
                    return
                for gi in range(g):
                    tg2 = jnp.concatenate([t[gi], t[gi]], axis=0)
                    xg = x_ref[gi].astype(jnp.float32)
                    xij = jnp.dot(e_exp, xg,
                                  preferred_element_type=jnp.float32)
                    out_ref[gi] = jnp.dot(
                        e_con, tg2 * xij,
                        preferred_element_type=jnp.float32)

            pathway(we1_ref, fa1, ba1, scalars_ref[0, 0], fb1, bb1,
                    x1_ref, out1_ref)
            pathway(we2_ref, fa2, ba2, scalars_ref[0, 1], fb2, bb2,
                    x2_ref, out2_ref)

        def block(e_p, c1, c2, h1, h2):
            b, p, c = e_p.shape
            n = h1.shape[1]
            g = fused._group_of(b, group)
            e_exp, e_con = block_packed._selectors(n)
            scalars = jnp.stack([
                c1["beta"].reshape(()), c2["beta"].reshape(())]).reshape(1, 2)
            vm = pltpu.VMEM
            args_ = [e_p, env_p, env_p, h1, h2, e_exp, e_con,
                     c1["fa"][0], c1["fa"][1], c1["fb"][0], c1["fb"][1],
                     c2["fa"][0], c2["fa"][1], c2["fb"][0], c2["fb"][1],
                     scalars]
            in_specs = [
                pl.BlockSpec((g, p, c), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((g, p), lambda i: (i, 0), memory_space=vm),
                pl.BlockSpec((g, p), lambda i: (i, 0), memory_space=vm),
                pl.BlockSpec((g, n, F), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((g, n, F), lambda i: (i, 0, 0),
                             memory_space=vm),
            ] + [fused._wspec(a) for a in args_[5:15]] + [
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
            return pl.pallas_call(
                functools.partial(kern, g=g, p=p, c=c),
                grid=(b // g,),
                in_specs=in_specs,
                out_specs=(pl.BlockSpec((g, n, F), lambda i: (i, 0, 0),
                                        memory_space=vm),
                           pl.BlockSpec((g, n, F), lambda i: (i, 0, 0),
                                        memory_space=vm)),
                out_shape=(jax.ShapeDtypeStruct((b, n, F), jnp.float32),
                           jax.ShapeDtypeStruct((b, n, F), jnp.float32)),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
                interpret=block_packed._INTERPRET,
            )(*args_)

        return block

    blocks_impl = {
        "none": None,
        "none-p": "packed-scaffold",
        "read": block_read,
        "xla": block_xla,
        "pallas": mk_block_pallas(jax.nn.softplus),
        "pallas-approx": mk_block_pallas(approx.softplus),
        "pk": mk_block_pk(),
        "pk-noagg": mk_block_pk("noagg"),
        "pk-nomlp": mk_block_pk("nomlp"),
    }

    def mk_stack(block, packed):
        def step(carry, _):
            h1, h2 = carry
            # fresh edge tensor each iteration (prevents filter hoisting;
            # costs HBM passes identical across same-scaffold variants)
            s = 1.0 + 1e-6 * jnp.mean(h1)
            if packed:
                e = (e0p.astype(jnp.float32) * s).astype(jnp.bfloat16)
            else:
                e = (e0.astype(jnp.float32) * s).astype(jnp.bfloat16)
            if not isinstance(block, str) and block is not None:
                for c1, c2 in convs:
                    o1, o2 = block(e, c1, c2, h1, h2)
                    h1 = 0.9 * h1 + 0.1 * jnp.tanh(o1)
                    h2 = 0.9 * h2 + 0.1 * jnp.tanh(o2)
            else:
                h1 = h1 + 1e-9 * jnp.sum(e[:, 0, 0])
            return (h1, h2), ()

        @jax.jit
        def run(h1, h2):
            (h1, h2), _ = jax.lax.scan(step, (h1, h2), None,
                                       length=args.iters)
            return h1, h2

        return run

    results = {}
    bases = {False: None, True: None}
    for name in args.variants.split(","):
        packed = name.startswith("pk") or name == "none-p"
        run = mk_stack(blocks_impl[name], packed)
        t0 = time.perf_counter()
        out = run(h1_0, h2_0)
        _ = jax.device_get(out[0])
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(h1_0, h2_0)
            _ = jax.device_get(out[0])
            ts.append(time.perf_counter() - t0)
        total = min(ts)
        entry = {"total_s": round(total, 3), "compile_s": round(compile_s, 1)}
        if name in ("none", "none-p"):
            bases[packed] = total
        else:
            base = bases[packed]
            per_block_us = (total - (base or 0.0)) * 1e6 / (args.iters * NB)
            entry["us_per_block"] = round(per_block_us, 1)
        results[name] = entry
        print(f"# {name}: {entry}", flush=True)

    print(json.dumps({"batch": B, "nodes": N, "feat": F, "iters": args.iters,
                      "blocks": NB, "group": group, "probes": results}))


if __name__ == "__main__":
    main()
