"""OBJ -> .pbrt converter (replaces src/tools/obj2pbrt.cpp).

Converts Wavefront OBJ geometry (v/vn/vt/f, with .mtl diffuse/specular
materials) into pbrt trianglemesh shapes.

Usage: python -m pbrt_v3_iile_tpu.cli.obj2pbrt scene.obj scene.pbrt
"""

from __future__ import annotations

import os
import sys


def _parse_mtl(path):
    mats = {}
    cur = None
    if not os.path.exists(path):
        return mats
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "newmtl":
                cur = parts[1]
                mats[cur] = {}
            elif cur and parts[0] in ("Kd", "Ks"):
                mats[cur][parts[0]] = [float(x) for x in parts[1:4]]
            elif cur and parts[0] == "Ns":
                mats[cur]["Ns"] = float(parts[1])
            elif cur and parts[0] == "map_Kd":
                mats[cur]["map_Kd"] = parts[1]
    return mats


def convert(obj_path: str, out_path: str) -> None:
    verts, normals, uvs = [], [], []
    groups = {}  # material -> list of (vidx, nidx, tidx) triangles
    cur_mat = ""
    mtl = {}
    base = os.path.dirname(os.path.abspath(obj_path))

    def fi(tok, nvals):
        parts = (tok.split("/") + ["", ""])[:3]
        out = []
        for s, n in zip(parts, nvals):
            if s:
                i = int(s)
                out.append(i - 1 if i > 0 else n + i)
            else:
                out.append(-1)
        return out

    with open(obj_path) as f:
        for line in f:
            p = line.split()
            if not p:
                continue
            if p[0] == "v":
                verts.append([float(x) for x in p[1:4]])
            elif p[0] == "vn":
                normals.append([float(x) for x in p[1:4]])
            elif p[0] == "vt":
                uvs.append([float(x) for x in p[1:3]])
            elif p[0] == "mtllib":
                mtl.update(_parse_mtl(os.path.join(base, p[1])))
            elif p[0] == "usemtl":
                cur_mat = p[1]
            elif p[0] == "f":
                nv = (len(verts), len(uvs), len(normals))
                idx = [fi(t, nv) for t in p[1:]]
                tris = groups.setdefault(cur_mat, [])
                for k in range(1, len(idx) - 1):
                    tris.append((idx[0], idx[k], idx[k + 1]))

    with open(out_path, "w") as out:
        out.write(f"# converted from {os.path.basename(obj_path)}\n")
        for mat, tris in groups.items():
            m = mtl.get(mat, {})
            kd = m.get("Kd", [0.5, 0.5, 0.5])
            ks = m.get("Ks", [0.0, 0.0, 0.0])
            out.write("AttributeBegin\n")
            if max(ks) > 0:
                ns = m.get("Ns", 10.0)
                rough = max(1e-3, 1.0 / max(ns, 1.0)) ** 0.5
                out.write(
                    f'Material "plastic" "color Kd" [{kd[0]} {kd[1]} {kd[2]}]'
                    f' "color Ks" [{ks[0]} {ks[1]} {ks[2]}]'
                    f' "float roughness" [{rough:.4f}]\n')
            else:
                out.write(
                    f'Material "matte" "color Kd" [{kd[0]} {kd[1]} {kd[2]}]\n')
            # compact remap of referenced vertices
            used = sorted({v[0] for tri in tris for v in tri})
            remap = {v: i for i, v in enumerate(used)}
            out.write('Shape "trianglemesh"\n  "point P" [')
            out.write(" ".join(
                f"{verts[v][0]} {verts[v][1]} {verts[v][2]}" for v in used))
            out.write(']\n  "integer indices" [')
            out.write(" ".join(
                f"{remap[a[0]]} {remap[b[0]]} {remap[c[0]]}"
                for a, b, c in tris))
            out.write("]\n")
            has_n = all(v[2] >= 0 for tri in tris for v in tri)
            if has_n and normals:
                nmap = {}
                for tri in tris:
                    for v in tri:
                        nmap.setdefault(v[0], v[2])
                out.write('  "normal N" [')
                out.write(" ".join(
                    f"{normals[nmap[v]][0]} {normals[nmap[v]][1]} "
                    f"{normals[nmap[v]][2]}" for v in used))
                out.write("]\n")
            out.write("AttributeEnd\n")
    print(f"wrote {out_path}: {sum(len(t) for t in groups.values())} "
          f"triangles, {len(groups)} materials")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        return 1
    convert(argv[0], argv[1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
