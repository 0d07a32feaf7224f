"""End-to-end PDB -> 3Di -> sketch evidence (component 21).

The real `mini3di` package carries learned network weights and is not
installed on this rig (the reference likewise ships the converter only
behind its optional `3di` cargo feature, structures.rs:14-57). To still
execute the WHOLE pipeline — PDB file on disk, chain iteration, per-chain
encode, IndexError warning path, comma join, AA level-1 hashing, sketch,
.skd write — these tests inject API-faithful stand-ins for `mini3di` and
`Bio.PDB` into sys.modules: a real fixed-column PDB parser and a
deterministic geometry-based encoder over the same Encoder API
(encode_chain/build_sequence). Everything outside the two external
packages is the production code path; the sketched output is asserted
against the host oracle fed the independently computed 3Di string.
"""

from __future__ import annotations

import math
import sys
import types

import numpy as np
import pytest

ALPHABET = "ACDEFGHIKLMNPQRSTVWY"

# chain A: 6 residues on a gentle helix; chain B: 1 residue (too short for
# any window-based descriptor -> the stand-in encoder raises IndexError,
# exercising pdb_to_3di's warn-and-skip branch like the reference helper)
_CA_A = [
    (0.000, 0.000, 0.000),
    (2.300, 2.100, 0.500),
    (4.100, 3.900, 1.700),
    (5.200, 6.300, 2.900),
    (5.800, 8.900, 4.200),
    (7.400, 10.100, 6.000),
]
_CA_B = [(20.0, 20.0, 20.0)]


def _pdb_text() -> str:
    lines = []
    serial = 1

    def atom(name, res_i, chain, xyz):
        nonlocal serial
        x, y, z = xyz
        # fixed columns: name @13-16, resName @18-20, chainID @22,
        # resSeq @23-26, x/y/z @31-54 (1-indexed PDB spec)
        line = (
            f"ATOM  {serial:>5} {name:<4} ALA {chain}{res_i:>4}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C"
        )
        serial += 1
        return line

    for i, xyz in enumerate(_CA_A, start=1):
        lines.append(atom("CA", i, "A", xyz))
    lines.append("TER")
    for i, xyz in enumerate(_CA_B, start=1):
        lines.append(atom("CA", i, "B", xyz))
    lines.append("END")
    return "\n".join(lines) + "\n"


def _encode_states(cas: list[tuple[float, float, float]]) -> list[int]:
    """Deterministic geometry hash: consecutive CA-CA distances quantized
    into the 20-state 3Di alphabet. Needs >= 2 residues."""
    if len(cas) < 2:
        raise IndexError("chain too short to encode")
    states = []
    for i in range(len(cas) - 1):
        d = math.dist(cas[i], cas[i + 1])
        states.append(int(d * 7.3) % 20)
    return states


def _install_fakes(monkeypatch):
    """Register stand-in mini3di + Bio.PDB modules in sys.modules."""

    class _Atom:
        def __init__(self, name, coord):
            self.name = name
            self.coord = coord

    class _Residue(list):
        pass

    class _Chain:
        def __init__(self, cid):
            self.id = cid
            self.residues = []

        def __iter__(self):
            return iter(self.residues)

        def __repr__(self):
            return f"<Chain id={self.id}>"

    class _Structure:
        def __init__(self, chains):
            self._chains = chains

        def get_chains(self):
            return iter(self._chains)

    class PDBParser:
        def __init__(self, QUIET=False):
            pass

        def get_structure(self, name, filename):
            chains: dict[str, _Chain] = {}
            residues: dict[tuple[str, int], _Residue] = {}
            with open(filename) as fh:
                for line in fh:
                    if not line.startswith("ATOM"):
                        continue
                    aname = line[12:16].strip()
                    cid = line[21]
                    resseq = int(line[22:26])
                    xyz = (
                        float(line[30:38]),
                        float(line[38:46]),
                        float(line[46:54]),
                    )
                    chain = chains.setdefault(cid, _Chain(cid))
                    key = (cid, resseq)
                    if key not in residues:
                        residues[key] = _Residue()
                        chain.residues.append(residues[key])
                    residues[key].append(_Atom(aname, xyz))
            return _Structure(list(chains.values()))

    class Encoder:
        def encode_chain(self, chain):
            cas = [
                a.coord
                for res in chain
                for a in res
                if a.name == "CA"
            ]
            return _encode_states(cas)

        def build_sequence(self, states):
            return "".join(ALPHABET[s] for s in states)

    mini3di = types.ModuleType("mini3di")
    mini3di.Encoder = Encoder
    bio = types.ModuleType("Bio")
    bio_pdb = types.ModuleType("Bio.PDB")
    bio_pdb.PDBParser = PDBParser
    bio.PDB = bio_pdb
    monkeypatch.setitem(sys.modules, "mini3di", mini3di)
    monkeypatch.setitem(sys.modules, "Bio", bio)
    monkeypatch.setitem(sys.modules, "Bio.PDB", bio_pdb)


def test_pdb_to_3di_chain_semantics(tmp_path, monkeypatch):
    """pdb_to_3di: per-chain encode, comma join, IndexError chains warned
    and skipped (3di_convert.py:11-30)."""
    _install_fakes(monkeypatch)
    from sketchtpu.ingest.pdb3di import pdb_to_3di

    pdb = tmp_path / "toy.pdb"
    pdb.write_text(_pdb_text())
    expected = "".join(ALPHABET[s] for s in _encode_states(_CA_A))
    with pytest.warns(RuntimeWarning, match="Not able to code"):
        got = pdb_to_3di("toy", str(pdb))
    assert got == expected  # chain B skipped, no stray comma


def test_pdb_sketch_end_to_end_matches_oracle(tmp_path, monkeypatch):
    """CLI `sketch --seq-type pdb --convert-pdb` writes a .skd equal to the
    host oracle sketching the independently computed 3Di string (AA level 1,
    sketch/mod.rs:300-309)."""
    _install_fakes(monkeypatch)
    from sketchtpu.cli import main as cli_main
    from sketchtpu.ingest.fastx import aa_stream_from_string
    from sketchtpu.sketchcore.sketch import sketch_aa_sample

    pdb = tmp_path / "toy.pdb"
    pdb.write_text(_pdb_text())
    rfile = tmp_path / "rfile.txt"
    rfile.write_text(f"toy\t{pdb}\n")
    db = tmp_path / "db"
    with pytest.warns(RuntimeWarning, match="Not able to code"):
        cli_main(
            ["sketch", "-f", str(rfile), "-o", str(db), "--seq-type",
             "pdb", "--convert-pdb", "-k", "3,4", "-s", "64", "--quiet"]
        )

    expected_3di = "".join(ALPHABET[s] for s in _encode_states(_CA_A))
    oracle = sketch_aa_sample(
        aa_stream_from_string(expected_3di), "toy", [3, 4], 64, 1
    )
    got = np.fromfile(f"{db}.skd", dtype="<u8")
    np.testing.assert_array_equal(got, oracle.usigs)

    from sketchtpu.formats.skm import MultiSketch

    ms = MultiSketch.load_metadata(str(db))
    assert list(ms.name_map) == ["toy"]
    assert ms.kmer_lengths == [3, 4]
