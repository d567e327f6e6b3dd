#!/usr/bin/env python
"""Generate meshes/sphere.msh — a small flow-past-sphere hex mesh in Gmsh
4.1 ASCII format, so tests and the sphere case don't depend on the
reference repo's mesh asset (reference reads ``mesh/sphere.msh``,
``simulation.cc:864-872``).

Topology: 6-panel radial shell between a sphere (r=0.5, origin) and the
box [-1.5, 1.5]^3 (cube-to-sphere projection). Boundary ids follow the
reference conventions consumed by ``models/sphere.py``:
  0 = sphere surface, 1 = inflow (x-), 2 = slip walls (y/z), 3 = outflow (x+).

Usage: python tools/make_sphere_fixture.py [n_face] [n_radial] [out.msh]
"""

import os
import sys

import numpy as np

R_IN = 0.5
R_BOX = 1.5


def build(n: int, m: int):
    """Vertices + lexicographic hexes of the 6-panel shell."""
    verts = []
    vmap = {}

    def vid(p):
        key = tuple(np.round(np.asarray(p) / 1e-9).astype(np.int64))
        if key not in vmap:
            vmap[key] = len(verts)
            verts.append(np.asarray(p, float))
        return vmap[key]

    cells = []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            # lattice of points: (n+1) x (n+1) face grid x (m+1) radial
            pts = np.zeros((n + 1, n + 1, m + 1, 3))
            for ia, a in enumerate(np.linspace(-1, 1, n + 1)):
                for ib, b in enumerate(np.linspace(-1, 1, n + 1)):
                    unit = np.zeros(3)
                    unit[axis] = sign
                    unit[(axis + 1) % 3] = a
                    unit[(axis + 2) % 3] = b
                    sph = R_IN * unit / np.linalg.norm(unit)
                    box = R_BOX * unit
                    for it, t in enumerate(np.linspace(0, 1, m + 1)):
                        pts[ia, ib, it] = (1 - t) * sph + t * box
            ids = np.zeros((n + 1, n + 1, m + 1), dtype=np.int64)
            for ia in range(n + 1):
                for ib in range(n + 1):
                    for it in range(m + 1):
                        ids[ia, ib, it] = vid(pts[ia, ib, it])
            for ia in range(n):
                for ib in range(n):
                    for it in range(m):
                        c = [
                            ids[ia, ib, it], ids[ia + 1, ib, it],
                            ids[ia, ib + 1, it], ids[ia + 1, ib + 1, it],
                            ids[ia, ib, it + 1], ids[ia + 1, ib, it + 1],
                            ids[ia, ib + 1, it + 1], ids[ia + 1, ib + 1, it + 1],
                        ]
                        cells.append(c)
    return np.asarray(verts), np.asarray(cells, dtype=np.int64)


def fix_orientation(verts, cells):
    v = verts[cells]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    e3 = v[:, 4] - v[:, 0]
    det = np.einsum("ci,ci->c", np.cross(e1, e2), e3)
    flip = det < 0
    cells[flip] = cells[flip][:, [4, 5, 6, 7, 0, 1, 2, 3]]
    return cells


def boundary_quads(verts, cells):
    """(sorted 4-tuple of vertex ids, boundary id) for each boundary face."""
    faces = {}
    FACE = [
        [0, 2, 4, 6], [1, 3, 5, 7],   # x-min/x-max local
        [0, 1, 4, 5], [2, 3, 6, 7],
        [0, 1, 2, 3], [4, 5, 6, 7],
    ]
    for c in cells:
        for f in FACE:
            key = tuple(sorted(int(c[i]) for i in f))
            faces[key] = faces.get(key, 0) + 1
    quads = []
    for key, cnt in faces.items():
        if cnt != 1:
            continue
        p = verts[list(key)]
        ctr = p.mean(axis=0)
        r = np.linalg.norm(p, axis=1)
        if np.all(np.abs(r - R_IN) < 1e-6):
            bid = 0
        elif np.all(np.abs(p[:, 0] + R_BOX) < 1e-9):
            bid = 1
        elif np.all(np.abs(p[:, 0] - R_BOX) < 1e-9):
            bid = 3
        else:
            bid = 2
        quads.append((key, bid))
    return quads


def write_msh(path, verts, cells, quads):
    # gmsh hex ordering from lexicographic
    HEXP = [0, 1, 3, 2, 4, 5, 7, 6]
    lines = []
    lines += ["$MeshFormat", "4.1 0 8", "$EndMeshFormat"]
    # entities: 4 surfaces (tags 10..13 with physical tags 0..3), 1 volume
    lines += ["$Entities", "0 0 4 1"]
    bb = f"{-R_BOX} {-R_BOX} {-R_BOX} {R_BOX} {R_BOX} {R_BOX}"
    for k in range(4):
        lines.append(f"{10 + k} {bb} 1 {k} 0")
    lines.append(f"1 {bb} 1 1 6 10 11 12 13 10 11")
    lines += ["$EndEntities"]
    # nodes
    n = len(verts)
    lines += ["$Nodes", f"1 {n} 1 {n}", f"3 1 0 {n}"]
    lines += [str(i + 1) for i in range(n)]
    lines += [f"{p[0]:.16g} {p[1]:.16g} {p[2]:.16g}" for p in verts]
    lines += ["$EndNodes"]
    # elements: 4 quad blocks + 1 hex block
    by_bid = {k: [] for k in range(4)}
    for key, bid in quads:
        by_bid[bid].append(key)
    n_blocks = sum(1 for k in range(4) if by_bid[k]) + 1
    n_el = len(quads) + len(cells)
    lines += ["$Elements", f"{n_blocks} {n_el} 1 {n_el}"]
    tag = 1
    for k in range(4):
        qs = by_bid[k]
        if not qs:
            continue
        lines.append(f"2 {10 + k} 3 {len(qs)}")
        for q in qs:
            lines.append(f"{tag} " + " ".join(str(v + 1) for v in q))
            tag += 1
    lines.append(f"3 1 5 {len(cells)}")
    for c in cells:
        lines.append(
            f"{tag} " + " ".join(str(int(c[p]) + 1) for p in HEXP)
        )
        tag += 1
    lines += ["$EndElements", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(__file__), "..", "meshes", "sphere.msh"
    )
    verts, cells = build(n, m)
    cells = fix_orientation(verts, cells)
    quads = boundary_quads(verts, cells)
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    write_msh(out, verts, cells, quads)
    bids = sorted({b for _, b in quads})
    print(f"wrote {out}: {len(verts)} vertices, {len(cells)} hexes, "
          f"{len(quads)} boundary quads, ids {bids}")


if __name__ == "__main__":
    main()
