"""Extract selected basis-set families from the reference's published
NWChem-format tables into basis/data/nwchem/ (elements H..Kr).

Constants-table extraction only (same posture as extract_gth_data.py /
extract_sto_basis.py): the files under pyscf/gto/basis are published
EMSL basis-set data, not code. The element blocks are copied verbatim
(text) so pyscf_isdf_tpu.basis.nwchem.parse reads them with the same
general parser used for any user-supplied NWChem file.

Run from the repo root:  python tools/extract_nwchem_basis.py
"""
import os

REF = "/root/reference/pyscf/gto/basis"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "pyscf_isdf_tpu", "basis", "data", "nwchem")

# Z <= 36 (H..Kr): the all-electron stack's practical range here
SYMBOLS = set("""H He Li Be B C N O F Ne Na Mg Al Si P S Cl Ar
K Ca Sc Ti V Cr Mn Fe Co Ni Cu Zn Ga Ge As Se Br Kr""".split())

# out-name -> source path under REF
FAMILIES = {
    "cc-pvdz": "cc-pvdz.dat",
    "cc-pvtz": "cc-pvtz.dat",
    "cc-pvqz": "cc-pvqz.dat",
    "aug-cc-pvdz": "aug-cc-pvdz.dat",
    "aug-cc-pvtz": "aug-cc-pvtz.dat",
    "def2-svp": "def2-svp.dat",
    "def2-tzvp": "def2-tzvp.dat",
    "6-31g": "pople-basis/6-31G.dat",
    "6-31gs": "pople-basis/6-31Gs.dat",
    "6-311g": "pople-basis/6-311G.dat",
    "6-311gss": "pople-basis/6-311Gss.dat",
}


def extract(src_path: str) -> str:
    """Keep only element blocks for SYMBOLS; stop at any ECP section."""
    out_lines = []
    keeping = False
    for raw in open(src_path):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        up = line.upper()
        if up.startswith("BASIS") or up.startswith("END"):
            continue
        if up == "ECP" or up.startswith("ECP "):
            break
        toks = line.split()
        if toks[0][0].isalpha():
            keeping = toks[0] in SYMBOLS
        if keeping:
            out_lines.append(raw.rstrip("\n").rstrip())
    return "\n".join(out_lines) + "\n"


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, rel in FAMILIES.items():
        text = extract(os.path.join(REF, rel))
        path = os.path.join(OUT, name + ".dat")
        with open(path, "w") as f:
            f.write(text)
        nelem = sum(1 for ln in text.splitlines()
                    if ln and ln.split()[0][0].isalpha()
                    and ln.split()[0] in SYMBOLS and len(ln.split()) == 2)
        print(f"{name}: {len(text)//1024} KiB, {nelem} shell headers")


if __name__ == "__main__":
    main()
