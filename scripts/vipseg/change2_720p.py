"""Resize raw VIPSeg images/panomasks to 720p (min side), like the official
prep. Behavioral anchor: reference:scripts/vipseg/change2_720p.py.

Run inside the VIPSeg root (expects imgs/ and panomasks/).
"""
import os
from multiprocessing import Pool
from os import path

from PIL import Image

DIR = "imgs"
DIR2 = "panomasks"
TARGET_DIR = "VIPSeg_720P"


def change(video: str, image: str) -> None:
    out_img = path.join(TARGET_DIR, "images", video, image)
    out_mask = path.join(TARGET_DIR, "panomasks", video,
                         image.split(".")[0] + ".png")
    if path.isfile(out_img) and path.isfile(out_mask):
        return
    mask_path = path.join(DIR2, video, image.split(".")[0] + ".png")
    if not path.isfile(mask_path):
        return  # test split: no mask

    img = Image.open(path.join(DIR, video, image))
    w, h = img.size
    img = img.resize((int(720 * w / h), 720), Image.BILINEAR)
    mask = Image.open(mask_path)
    mask = mask.resize((int(720 * w / h), 720), Image.NEAREST)

    os.makedirs(path.dirname(out_img), exist_ok=True)
    os.makedirs(path.dirname(out_mask), exist_ok=True)
    img.save(out_img)
    mask.save(out_mask)


if __name__ == "__main__":
    jobs = []
    for video in sorted(os.listdir(DIR)):
        if video.startswith("."):
            continue
        for image in sorted(os.listdir(path.join(DIR, video))):
            if not image.startswith("."):
                jobs.append((video, image))
    with Pool(16) as p:
        p.starmap(change, jobs)
    print("finish")
