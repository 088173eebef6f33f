"""gvtFileLoad rewritten on the api — the reference SimpleFileLoadApp:
load an OBJ (default bunny), identity instance, point light, render.

  python examples/file_load_app.py -obj path/to.obj [-image|-domain]
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
    p.add_argument("-obj", default="/root/reference/data/geom/bunny.obj")
    p.add_argument("-image", action="store_true")
    p.add_argument("-domain", action="store_true")
    p.add_argument("-wsize", type=int, nargs=2, default=[512, 512])
    p.add_argument("-eye", type=float, nargs=3, default=[0.0, 0.1, 0.3])
    p.add_argument("-look", type=float, nargs=3, default=[0.0, 0.1, -0.3])
    p.add_argument("-output", default="fileload")
    args = p.parse_args()

    api.gvtInit()
    from gravit_tpu.scene.readers.obj import read_obj

    mesh = read_obj(args.obj)
    name = pathlib.Path(args.obj).stem
    api.createMesh(name)
    node = api._db().find(name)
    node["ptr"] = mesh  # reader output drops straight into the DB node
    api.finishMesh(name, compute_normal=not mesh.have_normals)

    api.addInstance("inst0", name, np.eye(4, dtype=np.float32).flatten())
    api.addPointLight("light", [0.0, 0.1, 0.5], [1.0, 1.0, 1.0])
    api.addCamera("cam", args.eye, args.look, [0.0, 1.0, 0.0],
                  45.0 * math.pi / 180.0, 1, 1, 0.0)
    api.addFilm("film", args.wsize[0], args.wsize[1], args.output)
    sched = api.Schedule.Domain if args.domain else api.Schedule.Image
    api.addRenderer("r", int(api.Adapter.Embree), int(sched), "cam", "film")
    api.render("r")
    api.writeimage("r", args.output)
    print(f"wrote {args.output}.ppm")


if __name__ == "__main__":
    main()
