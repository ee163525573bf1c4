"""Dataset downloader (gdown mirrors, same sources as the reference;
reference:scripts/download_datasets.py). Downloads static pretraining data,
DAVIS, and YouTubeVOS to ../static, ../DAVIS, ../YouTube.
"""
import os
import zipfile

LICENSE = """
These are either re-distributions or simple derivatives of the original
datasets. Read and respect their licenses before use, and cite the original
papers.

DUTS: http://saliencydetection.net/duts
HRSOD: https://github.com/yi94code/HRSOD
FSS: https://github.com/HKUSTCV/FSS-1000
ECSSD: https://www.cse.cuhk.edu.hk/leojia/projects/hsaliency/dataset.html
BIG: https://github.com/hkchengrex/CascadePSP
YouTubeVOS: https://youtube-vos.org
DAVIS: https://davischallenge.org/
"""

STATIC = [("1wUJq3HcLdN-z1t4CsUhjeZ9BVDb9YKLd", "../static/static_data.zip",
           "../static/")]
DAVIS = [
    ("198aRlh5CpAoFz0hfRgYbiNenn_K8DxWD", "../DAVIS/DAVIS-data.zip",
     "../DAVIS/"),
    ("1kiaxrX_4GuW6NmiVuKGSGVoKGWjOdp6d",
     "../DAVIS/2017/DAVIS-2017-trainval-480p.zip", "../DAVIS/2017/"),
    ("1fmkxU2v9cQwyb62Tj1xFDdh2p4kDsUzD",
     "../DAVIS/2017/DAVIS-2017-test-dev-480p.zip", "../DAVIS/2017/"),
]
YOUTUBE = [
    ("13Eqw0gVK-AO5B-cqvJ203mZ2vzWck9s4", "../YouTube/all_frames.zip",
     "../YouTube/all_frames/"),
    ("1BWzrCWyPEmBEKm0lOHe5KLuBuQxUSwqz", "../YouTube/train.zip",
     "../YouTube/"),
    ("1o586Wjya-f2ohxYf9C1RlRH-gkrzGS8t", "../YouTube/valid.zip",
     "../YouTube/"),
]


def fetch(jobs):
    import gdown
    for file_id, out, extract_to in jobs:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        gdown.download(f"https://drive.google.com/uc?id={file_id}",
                       output=out, quiet=False)
        with zipfile.ZipFile(out) as z:
            z.extractall(extract_to)
        os.remove(out)


def main():
    print(LICENSE)
    reply = input("[y] to confirm, others to exit: ")
    if reply != "y":
        return
    fetch(STATIC)
    fetch(DAVIS)
    fetch(YOUTUBE)
    print("Done.")


if __name__ == "__main__":
    main()
