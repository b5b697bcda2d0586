"""Extract all-electron STO-nG basis data from the reference's public
NWChem-format tables into basis/data/sto_basis.json.

Constants-table extraction only (same posture as extract_gth_data.py for
the GTH parameters): the files under pyscf/gto/basis are published basis
set data, not code. Run from the repo root:

    python tools/extract_sto_basis.py
"""
import json
import os

REF = "/root/reference/pyscf/gto/basis"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "pyscf_isdf_tpu", "basis", "data", "sto_basis.json")
ELEMENTS = ["H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne",
            "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar", "Ti", "Fe"]
L_OF = {"S": [0], "P": [1], "D": [2], "SP": [0, 1]}


def parse_nwchem(path, elements):
    table = {}
    cur = None
    rows = []
    header = None

    def flush():
        if header is None or not rows:
            return
        symb, comp = header
        if symb not in elements:
            return
        ls = L_OF[comp]
        ent = table.setdefault(symb, [])
        for col, l in enumerate(ls):
            shell = [l] + [[r[0], r[1 + col]] for r in rows]
            ent.append(shell)

    for line in open(path):
        if line.startswith("#") or line.startswith("BASIS") or \
                line.startswith("END") or not line.strip():
            continue
        toks = line.split()
        if toks[0][0].isalpha():
            flush()
            header = (toks[0], toks[1].upper())
            rows = []
        else:
            rows.append([float(t.replace("D", "E").replace("d", "e"))
                         for t in toks])
    flush()
    return table


def main():
    out = {}
    for name in ("sto-3g", "sto-6g"):
        tab = parse_nwchem(os.path.join(REF, f"{name}.dat"), set(ELEMENTS))
        out[name] = tab
        print(name, "->", sorted(tab))
    with open(OUT, "w") as f:
        json.dump(out, f)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
