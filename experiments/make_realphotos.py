"""Build datasets/RealPhotos: 7 real photographs bundled with system packages.

The build environment has zero network egress, so the paper's Div2K val set
cannot be downloaded; these are the real photographic images available
offline (vs the generated dead-leaves Div2K stand-in).  Deterministic: a
straight RGB re-encode of files shipped inside installed wheels, so the set
is bit-identical across VM re-provisions.

Usage: python experiments/make_realphotos.py [out_dir=datasets/RealPhotos]
"""

import os
import sys
import sysconfig

from PIL import Image

SP = sysconfig.get_paths()["purelib"]
SOURCES = {
    # portrait (matplotlib sample data)
    "0001.png": f"{SP}/matplotlib/mpl-data/sample_data/grace_hopper.jpg",
    # landmark scene + flower macro (sklearn sample images)
    "0002.png": f"{SP}/sklearn/datasets/images/china.jpg",
    "0003.png": f"{SP}/sklearn/datasets/images/flower.jpg",
    # natural grass texture (dm_control outdoor arena)
    "0004.png": f"{SP}/dm_control/locomotion/arenas/assets/outdoor_natural/"
                "OutdoorGrassFloorD.png",
    # webcam scene (pygame camera docs)
    "0005.png": f"{SP}/pygame/docs/generated/_images/camera_rgb.jpg",
    # photographic material textures (gymnasium_robotics adroit assets)
    "0006.png": f"{SP}/gymnasium_robotics/envs/assets/adroit_hand/resources/"
                "textures/marble.png",
    "0007.png": f"{SP}/gymnasium_robotics/envs/assets/adroit_hand/resources/"
                "textures/foil.png",
}


def main(out_dir: str = "datasets/RealPhotos") -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, src in SOURCES.items():
        dst = os.path.join(out_dir, name)
        if os.path.exists(dst):
            continue
        Image.open(src).convert("RGB").save(dst)
        print(f"{dst} <- {src}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
