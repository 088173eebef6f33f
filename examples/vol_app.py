"""gvtVol rewritten on the api — the reference VolApp
(apps/render/VolApp.cpp): BOV volume bricks + transfer functions + domain
scheduling.

  python examples/vol_app.py -volfile data.bov -ctffile Grayscale.cmap \
      -otffile Grayscale.omap -wsize 512 512 [-domain]
Falls back to the synthetic wavelet volume when no -volfile is given.
"""

import argparse
import math
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from gravit_tpu import api


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-volfile", default="")
    p.add_argument("-ctffile", default="")
    p.add_argument("-otffile", default="")
    p.add_argument("-image", action="store_true")
    p.add_argument("-domain", action="store_true")
    p.add_argument("-wsize", type=int, nargs=2, default=[512, 512])
    p.add_argument("-eye", type=float, nargs=3, default=None)
    p.add_argument("-look", type=float, nargs=3, default=None)
    p.add_argument("-samplingrate", type=float, default=1.0)
    p.add_argument("-output", default="vol")
    args = p.parse_args()

    api.gvtInit()

    if args.volfile:
        from gravit_tpu.scene.readers.bov import read_bov
        from gravit_tpu.scene.transfer import TransferFunction

        tf = None
        if args.ctffile and args.otffile:
            # VolApp passes low=0 high=65536 (VolApp.cpp:127)
            tf = TransferFunction.from_files(args.ctffile, args.otffile,
                                             0.0, 65536.0)
        bricks = read_bov(args.volfile, tf=tf,
                          sampling_rate=args.samplingrate)
    else:
        from gravit_tpu.scene.volume import wavelet_volume

        bricks = [wavelet_volume(64, sampling_rate=args.samplingrate)]

    lo = np.min([b.bounds_min for b in bricks], axis=0)
    hi = np.max([b.bounds_max for b in bricks], axis=0)
    center = (lo + hi) / 2.0

    db = api._db()
    for i, b in enumerate(bricks):
        name = f"vol{i}"
        api.createVolume(name)
        db.find(name)["tf"] = b.tf
        flat = b.samples.reshape(-1)  # z-major view == x-fastest flat
        api.addVolumeSamples(name, flat, list(b.counts), list(b.origin),
                             list(b.spacing), b.sampling_rate)
        api.addInstance(f"inst{i}", name,
                        np.eye(4, dtype=np.float32).flatten())

    eye = args.eye or (center + (hi - lo) * 4.0).tolist()
    look = args.look or center.tolist()
    api.addCamera("cam", eye, look, [0.0, 0.0, 1.0],
                  30.0 * math.pi / 180.0, 1, 1, 0.5)
    api.addFilm("film", args.wsize[0], args.wsize[1], args.output)
    sched = api.Schedule.Domain if args.domain else api.Schedule.Image
    api.addRenderer("vr", int(api.Adapter.Pvol), int(sched), "cam", "film",
                    volume=True)
    api.render("vr")
    api.writeimage("vr", args.output)
    print(f"wrote {args.output}.ppm ({len(bricks)} brick(s))")


if __name__ == "__main__":
    main()
