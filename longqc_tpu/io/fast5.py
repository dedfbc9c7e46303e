"""Multi-read FAST5 ingestion (h5py-gated).

cf. lq_utils.parse_fast5_chunk (lq_utils.py:211-236) and
lq_nanopore.open_fast5/get_fastq_from_multi_fast5 (lq_nanopore.py:102-117).
"""

import os
import sys
from logging import getLogger

logger = getLogger(__name__)

try:
    import h5py
    HAS_H5PY = True
except ImportError:  # pragma: no cover
    h5py = None
    HAS_H5PY = False


def open_fast5(path):
    if not HAS_H5PY:
        raise RuntimeError("h5py is required for fast5 input")
    return h5py.File(path, "r")


def is_multi_fast5(path):
    with open_fast5(path) as f:
        return "/UniqueGlobalKey" not in f


def list_toplevel(f):
    return list(f.keys())


def get_fastq_from_multi_fast5(f, rn):
    # fastq string lives at /<read>/Analyses/Basecall_1D_000/BaseCalled_template/Fastq
    return f[rn]["Analyses"]["Basecall_1D_000"]["BaseCalled_template"][
        "Fastq"][()].decode("ascii")


def parse_fast5_chunk(dn, cs, is_upper=False):
    """Yield (reads, n_seqs, n_bases) chunks from a dir of multi-fast5."""
    reads = []
    n_seqs = 0
    n_bases = 0
    size = 0
    f5s = [os.path.join(dn, f) for f in os.listdir(dn) if f.endswith(".fast5")]
    for f5 in f5s:
        with open_fast5(f5) as f5h:
            for k in list_toplevel(f5h):
                if not k.startswith("read_"):
                    continue
                fastq = get_fastq_from_multi_fast5(f5h, k).splitlines()
                name = fastq[0].split(" ")[0]
                seq = fastq[1].upper() if is_upper else fastq[1]
                reads.append([name, seq, fastq[3]])
                size += (sys.getsizeof(name) + sys.getsizeof(fastq[1])
                         + sys.getsizeof(fastq[3]))
                n_bases += len(fastq[1])
                n_seqs += 1
                if size >= cs:
                    yield (reads, n_seqs, n_bases)
                    size = 0
                    reads = []
    yield (reads, n_seqs, n_bases)
