"""Platform QC tests on synthetic run artifacts."""

import gzip
import json
import os
import struct

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# minimal BAM writer (test fixture only)

def _bam_record(name, seq, tags=b""):
    l_seq = len(seq)
    code = {"=": 0, "A": 1, "C": 2, "M": 3, "G": 4, "T": 8, "N": 15}
    packed = bytearray()
    for i in range(0, l_seq, 2):
        hi = code[seq[i]] << 4
        lo = code[seq[i + 1]] if i + 1 < l_seq else 0
        packed.append(hi | lo)
    nb = name.encode() + b"\x00"
    data = struct.pack("<iiBBHHHiiii", -1, -1, len(nb), 0, 0, 0, 4,
                       l_seq, -1, -1, 0)
    data += nb + bytes(packed) + b"\xff" * l_seq + tags
    return struct.pack("<i", len(data)) + data


def _tag_A(tag, ch):
    return tag.encode() + b"A" + ch.encode()


def _tag_Bf(tag, vals):
    return (tag.encode() + b"B" + b"f" + struct.pack("<I", len(vals))
            + struct.pack("<%df" % len(vals), *vals))


def write_bam(path, header_text, records):
    payload = b"BAM\x01"
    ht = header_text.encode()
    payload += struct.pack("<i", len(ht)) + ht
    payload += struct.pack("<i", 0)  # n_ref
    for r in records:
        payload += r
    with gzip.open(path, "wb") as f:
        f.write(payload)


def test_bam_reader_roundtrip(tmp_path):
    from longqc_tpu.io.bam import BamReader
    p = str(tmp_path / "t.bam")
    recs = [_bam_record("m/1/0_5", "ACGTA", _tag_A("sz", "N")
                        + _tag_A("sc", "S"))]
    write_bam(p, "@HD\tVN:1.5\n", recs)
    reads = list(BamReader(p))
    assert len(reads) == 1
    assert reads[0].name == "m/1/0_5"
    assert reads[0].seq == "ACGTA"
    assert reads[0].get_tag("sz") == "N"
    assert reads[0].get_tag("sc") == "S"


def test_sequel_platformqc(tmp_path):
    from longqc_tpu.platform.sequel import run_platformqc, construct_polread

    # construct_polread unit cases (state machine port)
    # single subread covering 0..99
    q, s, hq, tot, is_pol, adn = construct_polread([(0, 100, "S")])
    assert is_pol and hq == 101 and tot == 101
    # subread + adapter + subread with an L (low-quality) tail
    rec = construct_polread([(0, 50, "S"), (50, 60, "A"), (60, 120, "S"),
                             (120, 150, "L")])
    assert rec[4] is True and rec[5] == 1

    data = tmp_path / "run"
    data.mkdir()
    scraps = []
    subs = []
    rng = np.random.RandomState(0)
    for zmw in range(30):
        ln = int(rng.randint(800, 3000))
        cut = ln // 2
        subs.append(_bam_record("m/%d/0_%d" % (zmw, cut), "ACGT" * 3,
                                _tag_Bf("sn", [5.0, 6.0, 7.0, 8.0])))
        subs.append(_bam_record("m/%d/%d_%d" % (zmw, cut + 20, ln),
                                "ACGT" * 3))
        scraps.append(_bam_record("m/%d/%d_%d" % (zmw, cut, cut + 20),
                                  "ACGT" * 3,
                                  _tag_A("sz", "N") + _tag_A("sc", "A")))
    # one control read
    scraps.append(_bam_record("m/999/0_500", "ACGT" * 3,
                              _tag_A("sz", "C") + _tag_A("sc", "F")))
    write_bam(str(data / "x.subreads.bam"),
              "@RG\tID:a\tDS:READTYPE=SUBREAD;Ipd:CodecV1\n", subs)
    write_bam(str(data / "x.scraps.bam"),
              "@RG\tID:a\tDS:READTYPE=SCRAP;Ipd:CodecV1\n", scraps)

    out = str(tmp_path / "out")
    res = run_platformqc(str(data), out)
    assert res["Num_of_reads"] == 30
    assert res["Throughput(Control)"] == 501
    assert os.path.exists(os.path.join(out, "QC_vals_sequel.json"))
    assert os.path.exists(os.path.join(
        out, "fig", "fig_sequel_platformqc_length.png"))


def test_rs_platformqc(tmp_path):
    from longqc_tpu.platform.rs import run_platformqc
    data = tmp_path / "run"
    data.mkdir()
    rng = np.random.RandomState(1)
    n = 300
    hq_start = rng.randint(0, 100, n)
    hq_len = rng.randint(500, 20000, n)
    with open(str(data / "x.sts.csv"), "w") as f:
        f.write("ReadScore,HQRegionStart,HQRegionEnd,NumBases\n")
        for i in range(n):
            f.write("%.3f,%d,%d,%d\n" % (
                rng.uniform(0.05, 0.9), hq_start[i],
                hq_start[i] + hq_len[i], hq_start[i] + hq_len[i] + 50))
    ns = "http://pacificbiosciences.com/PipelineStats/PipeStats.xsd"
    with open(str(data / "x.sts.xml"), "w") as f:
        f.write('<?xml version="1.0"?>\n'
                '<Report xmlns="%s">'
                "<ProdDist><BinCount>10</BinCount><BinCount>80</BinCount>"
                "<BinCount>10</BinCount>"
                "<BinLabel>Empty</BinLabel><BinLabel>Productive</BinLabel>"
                "<BinLabel>Other</BinLabel></ProdDist></Report>" % ns)
    out = str(tmp_path / "out")
    res = run_platformqc(str(data), out)
    assert res["Productivity"] == {"P0": 10, "P1": 80, "P2": 10}
    assert res["Num_of_reads"] > 0
    assert os.path.exists(os.path.join(out, "QC_vals_rs.json"))


def test_nanopore_platformqc(tmp_path):
    h5py = pytest.importorskip("h5py")
    from longqc_tpu.platform.nanopore import run_platformqc
    data = tmp_path / "run"
    data.mkdir()
    rng = np.random.RandomState(2)
    rate = 4000
    for i in range(40):
        p = str(data / ("read_%d.fast5" % i))
        with h5py.File(p, "w") as f:
            g = f.create_group("/UniqueGlobalKey/channel_id")
            g.attrs["channel_number"] = str(int(rng.randint(1, 513)))
            g.attrs["sampling_rate"] = float(rate)
            ct = f.create_group("/UniqueGlobalKey/context_tags")
            ct.attrs["flowcell_type"] = np.bytes_("FLO-MIN106")
            ct.attrs["sequencing_kit"] = np.bytes_("SQK-LSK108")
            r = f.create_group("Raw/Reads/Read_%d" % i)
            r.attrs["start_time"] = int(rng.randint(0, 100)) * rate
            r.attrs["duration"] = int(rng.randint(5, 60)) * rate
    out = str(tmp_path / "out")
    res = run_platformqc("minion", str(data), out)
    assert res["Sequencing time in seconds"] > 0
    assert 0 <= res["The maximum active pore rate"] <= 1
    assert os.path.exists(os.path.join(out, "QC_vals_minion.json"))
    assert os.path.exists(os.path.join(out, "fig", "fig_ont_platform.png"))
