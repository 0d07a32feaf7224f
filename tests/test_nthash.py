"""ntHash/aaHash unit tests against a direct rolling-recurrence oracle.

The oracle below implements the hash exactly as published (seed + srol
recurrence), independently of the windowed-XOR reformulation used by the
framework, covering the reference's own regression cases
(/root/reference/src/hashing/nthash_iterator.rs:525-731): N handling, multi-k
re-scans, terminal-N spurious-hash suppression, RC canonicalisation.
"""

import numpy as np
import pytest

from sketchtpu.constants import (
    NT_HASH_SEEDS,
    NT_RC_HASH_SEEDS,
    srol1,
    AA_SEED_TABLES,
)
from sketchtpu.hash.nthash_np import nthash_valid, valid_window_mask
from sketchtpu.hash.aahash_np import aahash_valid
from sketchtpu.ingest.fastx import (
    DnaStream,
    AaStream,
    _VALID_DNA,
    _ENCODE_DNA,
    _VALID_AA,
)
from sketchtpu.constants import SEQSEP


def dna_stream_from_str(seq: str) -> DnaStream:
    arr = np.frombuffer(seq.encode(), dtype=np.uint8)
    valid = _VALID_DNA[arr]
    codes = _ENCODE_DNA[arr[valid]]
    breaks = []
    count = 0
    for i, v in enumerate(valid):
        if v:
            count += 1
        else:
            breaks.append(count)
    breaks.append(count)  # end-of-record sentinel
    return DnaStream(codes=codes, breaks=np.array(breaks, dtype=np.int64))


def oracle_hashes(seq: str, k: int, rc: bool) -> list[int]:
    """Set of canonical hashes of valid windows via the direct recurrence."""
    segments = []
    cur = []
    for ch in seq:
        if _VALID_DNA[ord(ch)]:
            cur.append(int(_ENCODE_DNA[ord(ch)]))
        else:
            segments.append(cur)
            cur = []
    segments.append(cur)
    out = []
    for seg in segments:
        for s in range(len(seg) - k + 1):
            fh = 0
            for b in seg[s : s + k]:
                fh = srol1(fh) ^ NT_HASH_SEEDS[b]
            if rc:
                rh = 0
                for b in reversed(seg[s : s + k]):
                    rh = srol1(rh) ^ NT_RC_HASH_SEEDS[b]
                out.append(min(fh, rh))
            else:
                out.append(fh)
    return out


CASES = [
    ("ACGTACGTANACGTACGTNNTACGTACGT", [3, 5, 7], True),
    ("CTAGGGCCCTTTCCCGGATATAAACGCCAGGTTGAATCCGCATTTGGAGG", [3, 17, 31], True),
    # k >= 32: the 31/33-period rotation tables wrap (k%31, k%33 differ
    # from k); large-k windows also stress the multik prefilter carry
    ("CTAGGGCCCTTTCCCGGATATAAACGCCAGGTTGAATCCGCATTTGGAGGACGTACGTACGT",
     [33, 48, 63], True),
    ("CTAGGGCCCTTTCCCGGATATAAACGCCAGGTTGAATCCGCATTTGGAGGACGTACGTACGTA",
     [32, 64], False),
    ("ACGTACGTACGT", [4], False),
    ("ACGTACGNACGT", [4, 5], True),  # N in last k-1 positions of a segment
    ("ACGTANACGT", [4], False),
    ("ACGTACGTACGT", [4], True),
]


@pytest.mark.parametrize("seq,ks,rc", CASES)
def test_nthash_matches_oracle(seq, ks, rc):
    stream = dna_stream_from_str(seq)
    for k in ks:
        expected = oracle_hashes(seq, k, rc)
        actual = nthash_valid(stream, k, rc).tolist()
        assert actual == expected, f"k={k} seq={seq}"


def test_valid_window_mask_edges():
    # break at 0 and at n are window-aligned and do not invalidate
    mask = valid_window_mask(8, np.array([0, 8]), 4)
    assert mask.all()
    # break strictly inside invalidates windows crossing it
    mask = valid_window_mask(8, np.array([4]), 4)
    assert mask.tolist() == [True, False, False, False, True]


def oracle_aa_hashes(seq_bytes: np.ndarray, k: int, level: int) -> list[int]:
    """Direct recurrence + the reference iterator's emission rules."""
    table = AA_SEED_TABLES[level]
    n = len(seq_bytes)
    valid = _VALID_AA[seq_bytes]
    out = []
    for s in range(n - k + 1):
        if not valid[s : s + k].all():
            continue
        if s + k == n and not (s - 1 >= 0 and valid[s - 1]):
            continue  # final window reachable only by rolling
        fh = 0
        for b in seq_bytes[s : s + k]:
            fh = srol1(fh) ^ int(table[b])
        out.append(fh)
    return out


@pytest.mark.parametrize("level", [1, 2, 3])
def test_aahash_matches_oracle(level):
    seq = b"MKVLAA" + bytes([SEQSEP]) + b"WYRPFDEQHHGG" + bytes([SEQSEP])
    arr = np.frombuffer(seq, dtype=np.uint8)
    stream = AaStream(seq=arr.copy())
    for k in [3, 5]:
        expected = oracle_aa_hashes(arr, k, level)
        actual = aahash_valid(stream, k, level).tolist()
        assert actual == expected, f"k={k} level={level}"


def test_aahash_final_window_quirk():
    # no trailing separator (concat_fasta / 3Di string case): the final
    # window needs k+1 trailing valid chars to be emitted
    arr = np.frombuffer(b"MKVLAAWY", dtype=np.uint8)
    stream = AaStream(seq=arr.copy())
    k = 4
    expected = oracle_aa_hashes(arr, k, 1)
    actual = aahash_valid(stream, k, 1).tolist()
    assert actual == expected
    assert len(actual) == len(arr) - k + 1  # all windows reachable here

    # segment of exactly k valid chars at the end: final window dropped
    arr2 = np.frombuffer(b"MKVLA" + bytes([SEQSEP]) + b"WYRP", dtype=np.uint8)
    stream2 = AaStream(seq=arr2.copy())
    expected2 = oracle_aa_hashes(arr2, k, 1)
    actual2 = aahash_valid(stream2, k, 1).tolist()
    assert actual2 == expected2
    assert len(actual2) == 2  # MKVL, KVLA only; WYRP unreachable
