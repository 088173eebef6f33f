"""Render a scene described by a .conf file (ConfigFileLoader equivalent).

The reference's ConfigFileLoader (apps/render/ConfigFileLoader.cpp) is
bit-rotted/disabled; this drives the same README.conf format end-to-end:

  python examples/conf_app.py path/to/scene.conf [-output out]
"""

import argparse
import math
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from gravit_tpu import api
from gravit_tpu.scene.readers.conf import read_render_conf


def _is_geom_conf(path: str) -> bool:
    """data/geom/*.conf lines are `file lox loy loz hix hiy hiz` — detect
    that shape so both reference .conf dialects work from one app."""
    for line in pathlib.Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) >= 7:
            try:
                [float(x) for x in parts[1:7]]
                return True
            except ValueError:
                return False
        return False
    return False


def _render_geom_conf(conf: str, output: str) -> None:
    """Format 1 (geometry-domain list): one mesh domain per line, default
    camera fitted to the union bounding box (PlyApp.cpp's role)."""
    from gravit_tpu.scene.readers.conf import read_geom_conf
    from gravit_tpu.scene.readers.obj import read_obj
    from gravit_tpu.scene.readers.ply import read_ply

    entries = read_geom_conf(conf)
    api.gvtInit()
    lo = np.array([e.lo for e in entries], np.float32).min(axis=0)
    hi = np.array([e.hi for e in entries], np.float32).max(axis=0)
    for i, e in enumerate(entries):
        mesh = (read_ply(e.path) if e.path.endswith(".ply")
                else read_obj(e.path))
        name = f"m{i}"
        api.createMesh(name)
        api._db().find(name)["ptr"] = mesh
        api.finishMesh(name, compute_normal=not mesh.have_normals)
        api.addInstance(f"inst{i}", name,
                        np.eye(4, dtype=np.float32).flatten())
    c = (lo + hi) / 2.0
    diag = float(np.linalg.norm(hi - lo)) or 1.0
    eye = [float(c[0]), float(c[1]), float(c[2] + 1.2 * diag)]
    api.addPointLight("light", [eye[0], eye[1] + diag, eye[2]],
                      [1.0, 1.0, 1.0])
    api.addCamera("cam", eye, [float(x) for x in c], [0.0, 1.0, 0.0],
                  45.0 * math.pi / 180.0, 1, 1, 0.0)
    api.addFilm("film", 512, 512, output)
    api.addRenderer("r", int(api.Adapter.Embree), int(api.Schedule.Image),
                    "cam", "film")
    api.render("r")
    api.writeimage("r", output)
    print(f"wrote {output}.ppm ({len(entries)} domain(s))")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("conf")
    p.add_argument("-output", default="conf_render")
    args = p.parse_args()
    if _is_geom_conf(args.conf):
        _render_geom_conf(args.conf, args.output)
        return
    cfg = read_render_conf(args.conf)

    api.gvtInit()
    base = pathlib.Path(args.conf).parent
    volume = cfg.render_type.lower() == "volume"

    if volume:
        from gravit_tpu.scene.readers.bov import read_bov

        datafile = str((base / cfg.datafile)
                       if not pathlib.Path(cfg.datafile).is_absolute()
                       else cfg.datafile)
        bricks = read_bov(datafile, sampling_rate=cfg.sample_rate)
        db = api._db()
        for i, b in enumerate(bricks):
            name = f"vol{i}"
            api.createVolume(name)
            db.find(name)["tf"] = b.tf
            api.addVolumeSamples(name, b.samples.reshape(-1),
                                 list(b.counts), list(b.origin),
                                 list(b.spacing), b.sampling_rate)
            api.addInstance(f"inst{i}", name,
                            np.eye(4, dtype=np.float32).flatten())
    else:
        from gravit_tpu.scene.readers.obj import read_obj

        mesh = read_obj(str(base / cfg.datafile))
        api.createMesh("m0")
        api._db().find("m0")["ptr"] = mesh
        api.finishMesh("m0", compute_normal=not mesh.have_normals)
        api.addInstance("inst0", "m0", np.eye(4, dtype=np.float32).flatten())
        api.addPointLight("light", list(np.asarray(cfg.camera) +
                                        np.array([0.0, 100.0, 0.0])),
                          [1.0, 1.0, 1.0])

    api.addCamera("cam", cfg.camera, cfg.focus, cfg.up,
                  cfg.view_angle * math.pi / 180.0, 1, 1, 0.5)
    api.addFilm("film", cfg.width, cfg.height, args.output)
    sched = {"Image": api.Schedule.Image, "Domain": api.Schedule.Domain,
             "LoadOnce": api.Schedule.LoadOnce,
             "LoadAnyOnce": api.Schedule.LoadAnyOnce,
             "LoadAnother": api.Schedule.LoadAnother,
             "LoadMany": api.Schedule.LoadMany}.get(cfg.schedule_type,
                                                    api.Schedule.Image)
    adapter = api.Adapter.Pvol if volume else api.Adapter.Embree
    api.addRenderer("r", int(adapter), int(sched), "cam", "film",
                    volume=volume)
    api.render("r")
    api.writeimage("r", args.output)
    print(f"wrote {args.output}.ppm")


if __name__ == "__main__":
    main()
