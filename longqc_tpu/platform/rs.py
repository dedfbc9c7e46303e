"""PacBio RS-II platform QC (cf. lq_rs.py:93-223).

Parses the run's sts.csv (per-ZMW table) and sts.xml (productivity
bins), computes HQ-region length statistics with a gamma fit, and
writes JSON + two figures.
"""

import json
import logging
import os
import xml.etree.ElementTree as et

import numpy as np
import pandas as pd
from scipy.stats import gamma

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from longqc_tpu.io.stats import get_N50, get_NXX
from longqc_tpu.ops.distfit import estimate_gamma_dist
from longqc_tpu.report.plots import rgb

logger = logging.getLogger(__name__)

RS_NS = "http://pacificbiosciences.com/PipelineStats/PipeStats.xsd"


def parse_sts_xml(filepath, ns=RS_NS):
    """-> [P0, P1, P2] productivity bin counts (lq_rs.py:40-59)."""
    tree = et.parse(filepath)
    root = tree.getroot()
    bc = root.findall("./{%s}ProdDist/{%s}BinCount" % (ns, ns))
    bl = root.findall("./{%s}ProdDist/{%s}BinLabel" % (ns, ns))
    p0 = p1 = p2 = 0
    for i, c in enumerate(bl):
        if "BinLabel" in c.tag:
            if "Empty" in c.text:
                p0 = int(bc[i].text)
            elif "Productive" in c.text:
                p1 = int(bc[i].text)
            elif "Other" in c.text:
                p2 = int(bc[i].text)
    return [p0, p1, p2]


def _find_suffix(d, suffix):
    if not os.path.isdir(d):
        return None
    for i in os.listdir(d):
        p = os.path.join(d, i)
        if p.endswith(suffix):
            return p
    return None


def run_platformqc(data_path, output_path, *, suffix=None, b_width=1000):
    sfx = ("_" + suffix) if suffix else ""
    os.makedirs(os.path.join(output_path, "log"), exist_ok=True)
    os.makedirs(os.path.join(output_path, "fig"), exist_ok=True)
    log_path = os.path.join(output_path, "log",
                            "log_rs2_platformqc%s.txt" % sfx)
    fig_path = os.path.join(output_path, "fig",
                            "fig_rs2_platformqc_length%s.png" % sfx)
    fig_path2 = os.path.join(output_path, "fig",
                             "fig_rs2_platformqc_score%s.png" % sfx)
    json_path = os.path.join(output_path, "QC_vals_rs%s.json" % sfx)

    fh = logging.FileHandler(log_path, "w")
    logger.addHandler(fh)
    logger.info("Started RS-II platform QC for %s" % data_path)

    xml_file = _find_suffix(data_path, ".sts.xml")
    if not xml_file:
        logger.warning("sts.xml is missing. Productivity won't be shown")
        p0 = p1 = p2 = None
    else:
        p0, p1, p2 = parse_sts_xml(xml_file)

    csv_path = _find_suffix(data_path, ".sts.csv")
    if not csv_path:
        logger.error("Platform QC failed due to missing csv files")
        return 1
    df = pd.read_table(csv_path, sep=",")

    sel = df["ReadScore"] > 0.1
    vals = (df["HQRegionEnd"].values[sel]
            - df["HQRegionStart"].values[sel])
    a, b = estimate_gamma_dist(vals)
    _max = int(np.max(vals))
    _mean = float(np.mean(vals))
    _n50 = float(get_N50(vals))
    _n90 = float(get_NXX(vals, 90))
    throughput = int(np.sum(vals))
    fracs = vals / df["NumBases"].values[sel]

    tobe_json = {
        "Productivity": {"P0": p0, "P1": p1, "P2": p2},
        "Throughput": throughput,
        "Longest_read": _max,
        "Num_of_reads": len(vals),
        "polread_gamma_params": [float(a), float(b)],
        "Mean_polread_length": _mean,
        "N50_polread_length": _n50,
        "Mean_HQ_fraction": float(np.mean(fracs)),
    }
    with open(json_path, "w") as f:
        json.dump(tobe_json, f, indent=4)

    _plot_polread_lengths(fig_path, vals, df["NumBases"].values[sel],
                          a, b, _max, _mean, _n50, _n90, b_width)

    df2 = df.copy()
    df2["Interval"] = np.floor(
        (df2["HQRegionEnd"].values - df2["HQRegionStart"].values) / b_width)
    df2.boxplot(column="ReadScore", by="Interval", sym="+", rot=90,
                figsize=(max(int(max(df2["Interval"]) / 5 + 0.5), 4), 6))
    _, xmax = plt.gca().get_xlim()
    plt.title("Read scores over different length reads")
    plt.xticks(np.arange(xmax + 1),
               [int(i) for i in np.arange(xmax + 1) * b_width])
    plt.suptitle("")
    plt.savefig(fig_path2, bbox_inches="tight")
    plt.close()

    logger.info("Finished all processes.")
    logger.removeHandler(fh)
    fh.close()
    return tobe_json


def _plot_polread_lengths(fig_path, vals, numbases, a, b, _max, _mean,
                          _n50, _n90, b_width):
    x = np.linspace(0, gamma.ppf(0.99, a, 0, b))
    plt.plot(x, gamma(a, 0, b).pdf(x), c=rgb(214, 39, 40))
    plt.grid(True)
    plt.hist(vals, histtype="step",
             bins=np.arange(min(vals), _max + b_width, b_width),
             color=rgb(214, 39, 40), alpha=0.7, density=True)
    plt.xlabel("Read length")
    plt.ylabel("Probability density")
    good = rgb(44, 160, 44)
    meh = rgb(188, 189, 34)
    plt.axvline(x=_mean, linestyle="dashed", linewidth=2,
                color=good if _mean >= 10000 else meh, alpha=0.8)
    plt.axvline(x=_n50, linewidth=2,
                color=good if _n50 >= 20000 else meh, alpha=0.8)
    plt.hist(numbases, histtype="step",
             bins=np.arange(min(numbases), max(numbases) + b_width, b_width),
             color=rgb(31, 119, 180), alpha=0.7, density=True)
    ymin, ymax = plt.gca().get_ylim()
    xmin, xmax = plt.gca().get_xlim()
    plt.text(xmax * 0.6, ymax * 0.72,
             r"$\alpha=%.3f,\ \beta=%.3f$" % (a, b))
    plt.text(xmax * 0.6, ymax * 0.77, r"Gamma dist params:")
    plt.text(xmax * 0.6, ymax * 0.85, r"sample mean: %.3f" % (_mean,))
    plt.text(xmax * 0.6, ymax * 0.9, r"N50: %.3f" % (_n50,))
    plt.text(xmax * 0.6, ymax * 0.95, r"N90: %.3f" % (_n90,))
    plt.text(_mean, ymax * 0.85, r"Mean")
    plt.text(_n50, ymax * 0.9, r"N50")
    plt.savefig(fig_path, bbox_inches="tight")
    plt.close()
