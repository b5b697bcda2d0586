#!/usr/bin/env python
"""Extract GTH basis-set and pseudopotential parameter tables into JSON.

The CP2K-format parameter files (public scientific data originating from the
CP2K project, Goedecker-Teter-Hutter PRB 54, 1703 (1996); Krack TCA 114, 145
(2005)) are parsed from the read-only reference tree and re-emitted in this
framework's own JSON schema under ``pyscf_isdf_tpu/basis/data/``.

Run once at development time:
    python tools/extract_gth_data.py
"""
import json
import os
import re
import sys

REF = "/root/reference/pyscf/pbc/gto"
OUT = os.path.join(os.path.dirname(__file__), "..", "pyscf_isdf_tpu", "basis", "data")

BASIS_FILES = {
    "gth-szv": "basis/gth-szv.dat",
    "gth-dzv": "basis/gth-dzv.dat",
    "gth-dzvp": "basis/gth-dzvp.dat",
    "gth-tzvp": "basis/gth-tzvp.dat",
    "gth-tzv2p": "basis/gth-tzv2p.dat",
    "gth-qzv2p": "basis/gth-qzv2p.dat",
    "gth-szv-molopt-sr": "basis/gth-szv-molopt-sr.dat",
    "gth-dzvp-molopt-sr": "basis/gth-dzvp-molopt-sr.dat",
}

PP_FILES = {
    "gth-pade": "pseudo/gth-pade.dat",
    "gth-lda": "pseudo/gth-pade.dat",   # alias
    "gth-pbe": "pseudo/gth-pbe.dat",
    "gth-blyp": "pseudo/gth-blyp.dat",
    "gth-bp": "pseudo/gth-bp.dat",
}


def parse_basis_file(path):
    """Parse a CP2K GTH basis file.

    Format per element block:
        <Symbol> <NAME> [aliases]
        nsets
        for each set:  n lmin lmax nexp nc_lmin ... nc_lmax
        then nexp rows: exponent  c(l=lmin,ctr1) ... (column-major by l then ctr)

    Returns dict symbol -> list of shells [l, [e, c1, c2...], ...] sorted by l
    (the internal format: one entry per (l, contraction-set)).
    """
    out = {}
    with open(path) as f:
        text = f.read()
    # split element blocks on comment lines
    blocks = re.split(r"#\s*BASIS SET.*\n|^#\n", text, flags=re.M)
    for blk in blocks:
        lines = [ln.split("#")[0].strip() for ln in blk.splitlines()]
        lines = [ln for ln in lines if ln and not ln.startswith(("END", "BASIS"))]
        if len(lines) < 3:
            continue
        header = lines[0].split()
        if not header or not header[0][0].isalpha():
            continue
        symb = header[0]
        try:
            nsets = int(lines[1])
        except ValueError:
            continue
        idx = 2
        shells = []
        ok = True
        for _ in range(nsets):
            if idx >= len(lines):
                ok = False
                break
            comp = [int(x) for x in lines[idx].split()]
            idx += 1
            lmin, lmax, nexp = comp[1], comp[2], comp[3]
            ncontr = comp[4:]
            set_shells = [[l] for l in range(lmin, lmax + 1)]
            for _e in range(nexp):
                vals = [float(x) for x in lines[idx].split()]
                idx += 1
                exp = vals[0]
                pos = 1
                for i, l in enumerate(range(lmin, lmax + 1)):
                    row = [exp] + vals[pos:pos + ncontr[i]]
                    pos += ncontr[i]
                    set_shells[i].append(row)
            shells.extend(set_shells)
        if not ok:
            continue
        # sort by angular momentum, as the reference parser does
        shells.sort(key=lambda s: s[0])
        out[symb] = shells
    return out


def parse_pp_file(path):
    """Parse a CP2K GTH pseudopotential file.

    Returns dict key -> {nelec: [...], rloc: f, cexp: [...],
                         proj: [{rl: f, h: [[...]]}]}.
    Keys: bare symbol for the family default (the entry whose aliases
    include the plain family name), and "Sym-qN" for every charge-state
    variant.
    """
    out = {}
    with open(path) as f:
        raw = f.read()
    blocks = raw.split("\n#")
    for blk in blocks:
        lines = [ln.split("#")[0].rstrip() for ln in blk.splitlines()]
        lines = [ln for ln in lines if ln.strip()]
        # find the header line: "<Symb> GTH-XXX-qN [aliases]"
        start = None
        for i, ln in enumerate(lines):
            toks = ln.split()
            if len(toks) >= 2 and toks[0][0].isalpha() and "GTH" in toks[1].upper():
                start = i
                break
        if start is None:
            continue
        lines = lines[start:]
        try:
            symb = lines[0].split()[0]
            nelec = [int(x) for x in lines[1].split()]
            loc = lines[2].split()
            rloc = float(loc[0])
            nexp = int(loc[1])
            cexp = [float(x) for x in loc[2:2 + nexp]]
            nproj_types = int(lines[3].split()[0])
            proj = []
            idx = 4
            for _p in range(nproj_types):
                row = lines[idx].split()
                idx += 1
                rl = float(row[0])
                nl = int(row[1])
                hvals = [float(x) for x in row[2:]]
                for _i in range(1, nl):
                    hvals.extend(float(x) for x in lines[idx].split())
                    idx += 1
                h = [[0.0] * nl for _ in range(nl)]
                k = 0
                for i in range(nl):
                    for j in range(i, nl):
                        h[i][j] = h[j][i] = hvals[k]
                        k += 1
                proj.append({"rl": rl, "h": h})
        except (ValueError, IndexError):
            continue
        entry = {"nelec": nelec, "rloc": rloc, "cexp": cexp, "proj": proj}
        header_toks = lines[0].split()
        # store every q-variant, e.g. "Be-q2" from "Be GTH-PADE-q2 ..."
        import re as _re
        for tok in header_toks[1:]:
            m = _re.search(r"-(q\d+)$", tok.lower())
            if m:
                out.setdefault(f"{symb}-{m.group(1)}", entry)
        # default = the entry with a plain (suffix-free) family alias
        plain = any(not _re.search(r"-q\d+$", t.lower()) for t in header_toks[1:])
        if plain and symb not in out:
            out[symb] = entry
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    basis = {}
    for name, rel in BASIS_FILES.items():
        path = os.path.join(REF, rel)
        if os.path.exists(path):
            basis[name] = parse_basis_file(path)
            print(f"{name}: {len(basis[name])} elements")
    with open(os.path.join(OUT, "gth_basis.json"), "w") as f:
        json.dump(basis, f)

    pps = {}
    for name, rel in PP_FILES.items():
        path = os.path.join(REF, rel)
        if os.path.exists(path):
            pps[name] = parse_pp_file(path)
            print(f"{name}: {len(pps[name])} elements")
    with open(os.path.join(OUT, "gth_pp.json"), "w") as f:
        json.dump(pps, f)


if __name__ == "__main__":
    sys.exit(main())
