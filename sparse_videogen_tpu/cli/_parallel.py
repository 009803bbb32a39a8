"""Shared CLI parallelism surface (reference parallel flag group,
hyvideo_orig/config.py:351-369 --ulysses-degree/--ring-degree +
wan_orig text2video.py dit_fsdp)."""

from __future__ import annotations


def add_parallel_flags(p, *, dp: bool = False):
    if dp:
        p.add_argument("--dp", type=int, default=1,
                       help="data-parallel degree (CFG pair / batch)")
    p.add_argument("--ulysses_degree", type=int, default=1,
                   help="head-sharded sequence parallelism (all patterns)")
    p.add_argument("--ring_degree", type=int, default=1,
                   help="ring/context parallelism over tokens (dense/SAP where supported)")
    p.add_argument("--dit_fsdp", action="store_true",
                   help="shard DiT weights over all devices (FSDP analog)")
    return p


def mesh_and_shard(args, params, logger):
    """Build the dp x rp x sp mesh from flags and FSDP-shard params.

    Returns (mesh | None, params). Pure FSDP (only --dit_fsdp) puts all
    devices on dp: weights shard, activations replicate, XLA all-gathers
    weights at use (torch FSDP FULL_SHARD analog)."""
    import jax

    dp = getattr(args, "dp", 1)
    n = dp * args.ulysses_degree * args.ring_degree
    if n <= 1 and not args.dit_fsdp:
        return None, params
    from sparse_videogen_tpu.parallel import make_mesh, shard_params

    if args.dit_fsdp and n == 1:
        n = dp = len(jax.devices())
    mesh = make_mesh(n, dp=dp, sp=args.ulysses_degree, rp=args.ring_degree)
    params = shard_params(params, mesh)
    logger.info(f"mesh {dict(mesh.shape)} over {n} devices; params FSDP-sharded")
    return mesh, params
