"""Render a SLAM run's outputs (mesh + trajectory) to an image or an
interactive window.

The reference inspects runs through an Open3D GUI wired into the frame loop
(reference pytorch/main.py:105-155, utils/vis_util.py:7-142); this offline
pipeline dumps artifacts instead, and this script is the promised viewer
over them (SURVEY.md section 7): it reads ``trajectory.txt`` (TUM format),
``mesh.ply`` (binary, per-vertex uncertainty colors) and optionally a
ground-truth trajectory, and renders a 3-D view plus a top-down overlay.

Open3D is used when importable (interactive orbit view); otherwise
matplotlib renders the same content headlessly.

Usage:
    python tools/view.py <run_dir>              # reads trajectory.txt, mesh.ply
    python tools/view.py <run_dir> --save v.png
    python tools/view.py --mesh m.ply --trajectory traj.txt --gt gt.txt
"""
from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path

import numpy as np


def load_tum_trajectory(path: str) -> np.ndarray:
    """TUM rows (id tx ty tz qx qy qz qw) -> (N, 3) positions."""
    rows = np.loadtxt(path, dtype=np.float64)
    if rows.ndim == 1:
        rows = rows[None]
    return rows[:, 1:4]


def load_ply(path: str):
    """Read a (binary or ascii little-endian) PLY triangle mesh; returns
    (verts (V, 3) f32, colors (V, 3) u8 or None, faces (F, 3) i64)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n_vert = n_face = 0
        vert_props = []
        binary = any("binary_little_endian" in h for h in header)
        section = None
        for h in header:
            if h.startswith("element vertex"):
                n_vert = int(h.split()[-1])
                section = "vertex"
            elif h.startswith("element face"):
                n_face = int(h.split()[-1])
                section = "face"
            elif h.startswith("property") and section == "vertex":
                vert_props.append(h.split()[1:])
        has_color = any(p[-1] == "red" for p in vert_props)

        if binary:
            vsize = sum(4 if p[0] in ("float", "int") else 1 for p in vert_props)
            raw = f.read(n_vert * vsize)
            verts = np.zeros((n_vert, 3), np.float32)
            colors = np.zeros((n_vert, 3), np.uint8) if has_color else None
            for i in range(n_vert):
                off = i * vsize
                verts[i] = struct.unpack_from("<fff", raw, off)
                if has_color:
                    colors[i] = struct.unpack_from("<BBB", raw, off + 12)
            faces = np.zeros((n_face, 3), np.int64)
            for i in range(n_face):
                cnt = struct.unpack("<B", f.read(1))[0]
                idx = struct.unpack(f"<{cnt}i", f.read(4 * cnt))
                faces[i] = idx[:3]
        else:
            verts = np.zeros((n_vert, 3), np.float32)
            colors = np.zeros((n_vert, 3), np.uint8) if has_color else None
            for i in range(n_vert):
                vals = f.readline().split()
                verts[i] = [float(v) for v in vals[:3]]
                if has_color:
                    colors[i] = [int(v) for v in vals[3:6]]
            faces = np.array([[int(v) for v in f.readline().split()[1:4]]
                              for _ in range(n_face)], np.int64).reshape(-1, 3)
    return verts, colors, faces


def _decimate(verts, colors, faces, max_faces: int):
    if len(faces) <= max_faces:
        return verts, colors, faces
    keep = np.linspace(0, len(faces) - 1, max_faces).astype(np.int64)
    return verts, colors, faces[keep]


def view_matplotlib(verts, colors, faces, traj, gt, save: str):
    import matplotlib
    if save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(14, 7))
    ax3 = fig.add_subplot(1, 2, 1, projection="3d")
    if len(faces):
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection
        verts, colors, faces = _decimate(verts, colors, faces, 40000)
        polys = verts[faces]                       # (F, 3, 3)
        if colors is not None:
            tri_col = colors[faces[:, 0]].astype(np.float32) / 255.0
        else:
            tri_col = np.tile([[0.6, 0.6, 0.7]], (len(faces), 1))
        coll = Poly3DCollection(polys, facecolors=tri_col, alpha=0.55,
                                linewidths=0.0)
        ax3.add_collection3d(coll)
        pts = [verts] + [t for t in (traj, gt) if t is not None]
        allp = np.concatenate(pts)
        lo, hi = allp.min(0), allp.max(0)
        ax3.set_xlim(lo[0], hi[0])
        ax3.set_ylim(lo[1], hi[1])
        ax3.set_zlim(lo[2], hi[2])
    if traj is not None:
        ax3.plot(traj[:, 0], traj[:, 1], traj[:, 2], "b-", lw=2, label="estimated")
        ax3.scatter(*traj[0], c="g", s=40, label="start")
        ax3.scatter(*traj[-1], c="r", s=40, label="end")
    if gt is not None:
        ax3.plot(gt[:, 0], gt[:, 1], gt[:, 2], "k--", lw=1.5, label="ground truth")
    ax3.set_title("reconstruction + trajectory")
    ax3.legend(loc="upper right")

    ax2 = fig.add_subplot(1, 2, 2)
    if len(faces):
        ax2.scatter(verts[:, 0], verts[:, 1], s=0.2, c="gray", alpha=0.4)
    if traj is not None:
        ax2.plot(traj[:, 0], traj[:, 1], "b-", lw=2)
    if gt is not None:
        ax2.plot(gt[:, 0], gt[:, 1], "k--", lw=1.5)
    ax2.set_aspect("equal")
    ax2.set_title("top-down (x-y)")
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=110)
        print(f"wrote {save}")
    else:
        plt.show()


def view_open3d(verts, colors, faces, traj, gt):
    import open3d as o3d

    geoms = []
    if len(faces):
        mesh = o3d.geometry.TriangleMesh(
            o3d.utility.Vector3dVector(verts.astype(np.float64)),
            o3d.utility.Vector3iVector(faces))
        if colors is not None:
            mesh.vertex_colors = o3d.utility.Vector3dVector(colors / 255.0)
        mesh.compute_vertex_normals()
        geoms.append(mesh)
    for t, color in ((traj, [0, 0, 1]), (gt, [0, 0, 0])):
        if t is not None and len(t) > 1:
            lines = [[i, i + 1] for i in range(len(t) - 1)]
            ls = o3d.geometry.LineSet(o3d.utility.Vector3dVector(t),
                                      o3d.utility.Vector2iVector(lines))
            ls.colors = o3d.utility.Vector3dVector([color] * len(lines))
            geoms.append(ls)
    o3d.visualization.draw_geometries(geoms)


def main(argv=None):
    parser = argparse.ArgumentParser(description="difusion-tpu run viewer")
    parser.add_argument("run_dir", nargs="?", help="slam.py --output directory")
    parser.add_argument("--mesh", help="mesh .ply (overrides run_dir)")
    parser.add_argument("--trajectory", help="trajectory .txt (TUM format)")
    parser.add_argument("--gt", help="ground-truth trajectory (TUM format)")
    parser.add_argument("--save", default="", help="write a PNG instead of showing")
    parser.add_argument("--backend", choices=["auto", "open3d", "matplotlib"],
                        default="auto")
    args = parser.parse_args(argv)

    mesh_path = args.mesh
    traj_path = args.trajectory
    if args.run_dir:
        d = Path(args.run_dir)
        mesh_path = mesh_path or (str(d / "mesh.ply") if (d / "mesh.ply").exists() else None)
        traj_path = traj_path or (str(d / "trajectory.txt") if (d / "trajectory.txt").exists() else None)
    if not mesh_path and not traj_path:
        parser.error("nothing to show: pass a run dir or --mesh/--trajectory")

    verts = np.zeros((0, 3), np.float32)
    colors, faces = None, np.zeros((0, 3), np.int64)
    if mesh_path:
        verts, colors, faces = load_ply(mesh_path)
        print(f"{mesh_path}: {len(verts)} vertices, {len(faces)} faces")
    traj = load_tum_trajectory(traj_path) if traj_path else None
    gt = load_tum_trajectory(args.gt) if args.gt else None

    backend = args.backend
    if backend == "auto":
        try:
            import open3d  # noqa: F401
            backend = "open3d" if not args.save else "matplotlib"
        except ImportError:
            backend = "matplotlib"
    if backend == "open3d":
        view_open3d(verts, colors, faces, traj, gt)
    else:
        view_matplotlib(verts, colors, faces, traj, gt, args.save)


if __name__ == "__main__":
    sys.exit(main())
