"""Offline mesh extraction from a saved map snapshot (the reference README's
"saving and loading the map later" workflow, pytorch/README.md:61: load the
map, extract at higher resolution / triangle budget than the interactive run).

Usage:
    python -m difusion_tpu.mesh_tool map.npz out.ply \
        --hyper /path/to/hyper.json --epoch 300 --resolution 8 \
        [--max-std 0.15] [--max-triangles 10000000]
"""
from __future__ import annotations

import argparse
import logging

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="difusion-tpu offline mesher")
    parser.add_argument("map", help="map .npz written by SLAMSystem.save_map")
    parser.add_argument("output", help="output mesh (.ply or .obj)")
    parser.add_argument("--hyper", required=True, help="prior hyper.json")
    parser.add_argument("--epoch", type=int, default=-1)
    parser.add_argument("--resolution", type=int, default=8)
    parser.add_argument("--max-std", type=float, default=2000.0)
    parser.add_argument("--max-triangles", type=int, default=int(1e7))
    parser.add_argument("--no-interpolate", action="store_true")
    parser.add_argument("--fast", action="store_true",
                        help="coarse-to-fine lattice evaluation (reference "
                             "fast mode): ~3x fewer decoder evals at r=8")
    parser.add_argument("--refine-fraction", type=float, default=0.2,
                        help="--fast: fraction of (2r)^3 sites re-evaluated "
                             "exactly per block")
    parser.add_argument("--shard", action="store_true",
                        help="shard the decoder lattice evaluation over all "
                             "visible devices (multi-chip offline meshing)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from .utils.jaxtools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    from .core import hash_map as HM
    from .core import map as M
    from .core.meshing import HashMeshExtractor, MeshExtractor
    from .slam import load_prior

    dec, _, spec = load_prior(args.hyper, args.epoch)

    data = np.load(args.map)
    is_hash = "cfg.table_size" in data
    kw = dict(voxel_resolution=args.resolution,
              max_triangles=args.max_triangles,
              interpolate=not args.no_interpolate,
              fast=args.fast, refine_fraction=args.refine_fraction,
              shard=args.shard)
    if is_hash:
        cfg, state = HM.load_map(args.map)
        mesher = HashMeshExtractor(cfg, dec, spec, **kw)
    else:
        cfg, state = M.load_map(args.map)
        mesher = MeshExtractor(cfg, dec, spec, **kw)

    mesher.extract(state, max_std=args.max_std, no_cache=True)
    tris, _ = mesher.triangles()
    logging.info("extracted %d triangles at resolution %d",
                 len(tris), args.resolution)
    if args.output.endswith(".obj"):
        mesher.write_obj(args.output)
    else:
        mesher.write_ply(args.output)
    print(f"{args.output}: {len(tris)} triangles")


if __name__ == "__main__":
    main()
