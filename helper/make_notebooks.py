"""Generate the notebook-form analysis artifacts (parity with the
reference's notebooks/ set; see /root/reference listing in SURVEY.md).

Each notebook is a thin, runnable view over `benchmarks/analysis/` — the
same figure logic the scripts use (kept in ONE place, smoke-tested in
tests/test_analysis.py), so the notebooks cannot rot independently.

    python helper/make_notebooks.py      # rewrites notebooks/*.ipynb
"""
from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETUP = """\
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.getcwd(), "..")))
import matplotlib
matplotlib.rcParams["figure.dpi"] = 110
"""


def nb(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def md(text):
    return {"cell_type": "markdown", "metadata": {},
            "source": text.splitlines(keepends=True)}


def code(text):
    return {"cell_type": "code", "execution_count": None, "metadata": {},
            "outputs": [], "source": text.splitlines(keepends=True)}


NOTEBOOKS = {
    "plot_centroid.ipynb": [
        md("# Solid centroid trajectory + area conservation\n\n"
           "Mirrors the reference's `plot_centroid.ipynb` on this "
           "framework's snapshot output (`data_??????.h5`/`.npz` frames). "
           "Run a soft-disc case first, e.g.\n\n"
           "```bash\npython benchmarks/soft_disc_in_lid_driven.py 128 "
           "semilagrangian 8.0 --cpu --f64\n```"),
        code(SETUP),
        code("RUN_DIR = \"../outputs/soft_disc_lid_N128_semilagrangian\"\n"
             "from benchmarks.analysis import plot_centroid\n"
             "plot_centroid.run(RUN_DIR, with_refs=True)"),
        md("`with_refs=True` overlays the published Sugiyama (2011) and "
           "Kolahduz (2023) centroid tracks (`data/*.csv`) — the validation "
           "comparison quantified in `benchmarks/README.md`."),
    ],
    "plot_energy.ipynb": [
        md("# Energy budget over time\n\n"
           "Mirrors the reference's `plot_energy.ipynb`: kinetic, strain, "
           "and dissipated energy from a run's `energy.csv` "
           "(`pyrmt_tpu.diagnostics` computes all three in-graph)."),
        code(SETUP),
        code("RUN_DIRS = [\"../outputs/disc_tg_N128_semilagrangian\"]\n"
             "from benchmarks.analysis import plot_energy\n"
             "plot_energy.run(RUN_DIRS)"),
    ],
    "plot_lid_driven.ipynb": [
        md("# Lid-driven cavity vs Ghia et al. (1982)\n\n"
           "Mirrors the reference's `plot_lid_driven.ipynb`: the steady "
           "u(y) centerline against the published Ghia data.\n\n"
           "```bash\npython benchmarks/lid_driven_cavity.py 100 129\n```"),
        code(SETUP),
        code("SOURCE = \"../outputs/lid_driven_Re100\"\n"
             "from benchmarks.analysis import plot_lid_driven\n"
             "plot_lid_driven.run(SOURCE, Re=100)"),
    ],
    "plotting_lid_driven.ipynb": [
        md("# Lid-driven cavity fields\n\n"
           "Mirrors the reference's `plotting_lid_driven.ipynb`: velocity "
           "magnitude / pressure / vorticity panels from the final "
           "snapshot of a cavity run."),
        code(SETUP),
        code("SOURCE = \"../outputs/lid_driven_Re100\"\n"
             "from benchmarks.analysis import plot_fields\n"
             "plot_fields.run(SOURCE)"),
    ],
    "plot_soft_disc_lid_driven.ipynb": [
        md("# Soft disc in the lid-driven cavity — snapshot panels\n\n"
           "Mirrors the reference's `plot_soft_disc_lid_driven.ipynb`: "
           "interface + field panels at selected times, plus the "
           "two-resolution interface overlay "
           "(`benchmarks/plot_soft_disc_panels.py`)."),
        code(SETUP),
        code("RUN_DIR = \"../outputs/soft_disc_lid_N128_semilagrangian\"\n"
             "from benchmarks.analysis import plot_fields\n"
             "plot_fields.run(RUN_DIR)"),
        code("# interface panels + N=64 vs N=128 overlay (same figure the\n"
             "# validation row cites)\n"
             "import subprocess, sys\n"
             "subprocess.run([sys.executable,\n"
             "    \"../benchmarks/plot_soft_disc_panels.py\",\n"
             "    \"../outputs/soft_disc_lid_N64_semilagrangian\",\n"
             "    \"../outputs/soft_disc_lid_N128_semilagrangian\"],\n"
             "    check=False)"),
    ],
    "plot_soft_disc_taylor_green.ipynb": [
        md("# Soft disc in the Taylor-Green vortex\n\n"
           "Mirrors the reference's `plot_soft_disc_taylor_green.ipynb`: "
           "energy conservation for the disc-in-TG case "
           "(drift measured at −2.9% over t=[0,1] at N=128; see "
           "`benchmarks/README.md`).\n\n"
           "```bash\npython benchmarks/disc_in_taylor_green.py 128 "
           "semilagrangian --cpu --f64\n```"),
        code(SETUP),
        code("RUN_DIRS = [\"../outputs/disc_tg_N128_semilagrangian\"]\n"
             "from benchmarks.analysis import plot_energy\n"
             "plot_energy.run(RUN_DIRS)"),
        code("from benchmarks.analysis import plot_fields\n"
             "plot_fields.run(\"../outputs/disc_tg_N128_semilagrangian\")"),
    ],
    "plotting.ipynb": [
        md("# General field plotting\n\n"
           "Mirrors the reference's `plotting.ipynb`: load any snapshot "
           "frame (`.h5` or `.npz`) and render its fields. Works on every "
           "driver's output directory."),
        code(SETUP),
        code("SOURCE = \"../outputs/soft_disc_lid_N128_semilagrangian\"  "
             "# any run dir or frame file\n"
             "from benchmarks.analysis import plot_fields\n"
             "plot_fields.run(SOURCE)"),
    ],
    "capillary_and_density.ipynb": [
        md("# Beyond-reference cases: coupled capillary drop + "
           "density contrast\n\n"
           "The two physics cases this framework adds over the reference "
           "(balanced-force CSF through the full coupled loop; "
           "variable-density projection under buoyancy):\n\n"
           "```bash\npython benchmarks/capillary_drop_coupled.py 128 --cpu\n"
           "python benchmarks/density_contrast_disc.py 128 10 --cpu\n```"),
        code(SETUP),
        code("import numpy as np, matplotlib.pyplot as plt\n"
             "d = np.genfromtxt(\"../outputs/capillary_drop_N128/"
             "oscillation.csv\", delimiter=\",\", names=True)\n"
             "fig, ax = plt.subplots(1, 2, figsize=(10, 3.2))\n"
             "ax[0].plot(d[\"t\"], d[\"aspect\"]); ax[0].axhline(1, ls=\":\")\n"
             "ax[0].set(xlabel=\"t\", ylabel=\"sqrt(Ixx/Iyy)\",\n"
             "          title=\"n=2 capillary oscillation\")\n"
             "ax[1].semilogy(d[\"t\"], d[\"umax\"])\n"
             "ax[1].set(xlabel=\"t\", ylabel=\"max |u|\",\n"
             "          title=\"velocity envelope\")\n"
             "fig.tight_layout()"),
        code("d = np.genfromtxt(\"../outputs/density_contrast_N128/"
             "trajectory.csv\", delimiter=\",\", names=True)\n"
             "fig, ax = plt.subplots(1, 2, figsize=(10, 3.2))\n"
             "ax[0].plot(d[\"t\"], d[\"yc\"])\n"
             "ax[0].set(xlabel=\"t\", ylabel=\"centroid y\",\n"
             "          title=\"sinking disc (rho ratio 10)\")\n"
             "ax[1].plot(d[\"t\"], d[\"cg_iters_mean\"])\n"
             "ax[1].set(xlabel=\"t\", ylabel=\"CG iterations/step\",\n"
             "          title=\"symmetrized PCG cost\")\n"
             "fig.tight_layout()"),
    ],
}


def main():
    out_dir = os.path.join(HERE, "notebooks")
    os.makedirs(out_dir, exist_ok=True)
    for name, cells in NOTEBOOKS.items():
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            json.dump(nb(cells), f, indent=1)
            f.write("\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
