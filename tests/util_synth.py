"""Synthetic long-read data generation for oracle tests."""

import numpy as np

BASES = "ACGT"


def make_genome(rng, n):
    return "".join(BASES[i] for i in rng.randint(0, 4, size=n))


def revcomp(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


def mutate(rng, seq, err=0.1):
    """Apply substitutions/insertions/deletions at uniform rate."""
    out = []
    for ch in seq:
        r = rng.random_sample()
        if r < err * 0.5:       # substitution
            out.append(BASES[rng.randint(0, 4)])
        elif r < err * 0.75:    # deletion
            pass
        elif r < err:           # insertion
            out.append(ch)
            out.append(BASES[rng.randint(0, 4)])
        else:
            out.append(ch)
    return "".join(out)


def sample_reads(rng, genome, n_reads, min_len=800, max_len=3000,
                 err=0.1, rev_frac=0.5, junk_frac=0.0):
    """Simulated reads with quality strings; some pure-junk reads."""
    reads = []
    for i in range(n_reads):
        if rng.random_sample() < junk_frac:
            ln = rng.randint(min_len, max_len)
            seq = make_genome(rng, ln)
        else:
            ln = rng.randint(min_len, max_len)
            start = rng.randint(0, max(1, len(genome) - ln))
            seq = genome[start:start + ln]
            if rng.random_sample() < rev_frac:
                seq = revcomp(seq)
            seq = mutate(rng, seq, err)
        qual = "".join(chr(33 + rng.randint(3, 41)) for _ in range(len(seq)))
        reads.append(["read%05d" % i, seq, qual])
    return reads


def write_fastq_file(path, reads):
    with open(path, "w") as f:
        for name, seq, qual in reads:
            f.write("@%s\n%s\n+\n%s\n" % (name, seq, qual))


def write_fasta_file(path, reads):
    with open(path, "w") as f:
        for r in reads:
            f.write(">%s\n%s\n" % (r[0], r[1]))
