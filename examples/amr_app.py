"""gvtAmr rewritten on the api — the reference AmrApp
(apps/render/AmrApp.cpp:201-401): an .amrvol index of nested VTK
structured-points grids becomes level-0 volume domains with AMR subgrids
attached via api.addAmrSubgrid; domain or image scheduling; PPM out.

  python examples/amr_app.py                       # reference ballinthecorner
  python examples/amr_app.py -volfile scene.amrvol -ctffile c.cmap \
      -otffile o.omap -wsize 512 512 [-domain]
  python examples/amr_app.py -synthetic            # nested wavelet subgrid

The synthetic scene needs no data files: a coarse wavelet field with a 2x
refined wavelet subgrid over its central octant — the minimal AMR tree.
"""

import argparse
import math
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from gravit_tpu import api

REF_DATA = pathlib.Path("/root/reference/data")


def synthetic_amr():
    """Coarse 32^3 wavelet + one 2x-refined central subgrid (level 1):
    the SAME wavelet field (scene/volume.wavelet_volume's formula)
    evaluated at half spacing over the central octant — the minimal
    nested griddata tree (Volume.h:40-165)."""
    from gravit_tpu.scene.volume import wavelet_volume

    n = 32
    coarse = wavelet_volume(n)
    m = n + 1  # fine points spanning [n/4, 3n/4] at 0.5 spacing
    idx = np.arange(m, dtype=np.float32) * 0.5 + (n / 4.0)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    cx = (n - 1) / 2.0
    g = np.exp(-(((x - cx) ** 2 + (y - cx) ** 2 + (z - cx) ** 2)
                 / (2 * (n / 4.0) ** 2)))
    w = (100.0 * g + 30.0 * np.sin(x * 0.4) * np.cos(y * 0.35)
         + 20.0 * np.cos(z * 0.3))
    fine_samples = np.transpose(w, (2, 1, 0)).astype(np.float32)
    return coarse, fine_samples, [m, m, m], [n / 4.0] * 3, [0.5] * 3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-volfile",
                   default=str(REF_DATA / "vol/ballinthecorner.amrvol"))
    p.add_argument("-ctffile", default=str(REF_DATA / "colormaps/Balls.cmap"))
    p.add_argument("-otffile", default=str(REF_DATA / "colormaps/Balls.omap"))
    p.add_argument("-synthetic", action="store_true")
    p.add_argument("-image", action="store_true")
    p.add_argument("-domain", action="store_true")
    p.add_argument("-wsize", type=int, nargs=2, default=[500, 500])
    p.add_argument("-eye", type=float, nargs=3, default=None)
    p.add_argument("-look", type=float, nargs=3, default=None)
    p.add_argument("-samplingrate", type=float, default=1.0)
    p.add_argument("-output", default="amr")
    args = p.parse_args()

    api.gvtInit()
    db = api._db()

    if args.synthetic or not pathlib.Path(args.volfile).exists():
        from gravit_tpu.scene.transfer import TransferFunction

        coarse, fsamp, fcounts, forigin, fspacing = synthetic_amr()
        name = "amrvol0"
        api.createVolume(name, amr=True)
        db.find(name)["tf"] = TransferFunction.gray_ramp(
            low=-50.0, high=150.0, max_opacity=0.1)
        api.addVolumeSamples(
            name, coarse.samples.reshape(-1), list(coarse.counts),
            list(coarse.origin), list(coarse.spacing), args.samplingrate)
        api.addAmrSubgrid(name, 1, 1, np.asarray(fsamp).reshape(-1),
                          fcounts, forigin, fspacing)
        api.addInstance("inst0", name,
                        np.eye(4, dtype=np.float32).flatten())
        domains = 1
        lo = np.asarray(coarse.bounds_min)
        hi = np.asarray(coarse.bounds_max)
        eye = args.eye or (((lo + hi) / 2) + (hi - lo) * 2.0).tolist()
        look = args.look or ((lo + hi) / 2).tolist()
    else:
        # the AmrApp path proper: amrvol index -> level-0 domains, BFS
        # subgrid tree per domain (AmrApp.cpp:316-334), TF range 0..83.1
        # (AmrApp.cpp:308)
        from gravit_tpu.scene.readers.vtk import (amr_domain_subgrids,
                                                  read_amrvol,
                                                  read_vtk_structured_points)

        idx = read_amrvol(args.volfile)
        domains = idx.grids_per_level[0]
        for d in range(domains):
            name = f"{args.volfile}{d}"
            api.createVolume(name, amr=True)
            api.addVolumeTransferFunctions(name, args.ctffile, args.otffile,
                                           0.0, 83.1)
            g = read_vtk_structured_points(idx.grid_files[d])
            api.addVolumeSamples(name, g.data.reshape(-1), list(g.dims),
                                 list(g.origin), list(g.spacing),
                                 args.samplingrate)
            for k in amr_domain_subgrids(idx, d):
                sg = read_vtk_structured_points(idx.grid_files[k])
                api.addAmrSubgrid(name, k, idx.level_of_grid[k],
                                  sg.data.reshape(-1), list(sg.dims),
                                  list(sg.origin), list(sg.spacing))
            api.addInstance(f"inst{d}", name,
                            np.eye(4, dtype=np.float32).flatten())
        eye = args.eye or [3.0, 3.0, 3.0]
        look = args.look or [-4.0, -4.0, -4.0]

    api.addCamera("conecam", eye, look, [0.0, 0.0, 1.0],
                  30.0 * math.pi / 180.0, 1, 1, 0.5)
    api.addFilm("conefilm", args.wsize[0], args.wsize[1], args.output)
    sched = api.Schedule.Domain if args.domain else api.Schedule.Image
    api.addRenderer("amr", int(api.Adapter.Pvol), int(sched), "conecam",
                    "conefilm", volume=True)
    api.render("amr")
    api.writeimage("amr", args.output)
    print(f"wrote {args.output}.ppm ({domains} AMR domain(s))")


if __name__ == "__main__":
    main()
