"""Build the CaDIS metadata table from a raw dataset tree.

Reference: ``utils/df_from_data.py`` (walks ``VideoXX/Images`` folders and
pickles a dataframe).  Here the output is the ``data/data.csv`` format the
loaders read (``data/datasets.py:get_cadis_dataframes``), written as CSV so
the table stays human-diffable and pickle-free.

  python -m mscs_tpu.data.df_builder --path /path/to/CaDIS/segmentation \
      [--out data/data.csv]
"""
from __future__ import annotations

import argparse
import pathlib


def build_cadis_records(data_path: str | pathlib.Path) -> list[list]:
    """[[vid_num, img_path, lbl_path], ...] sorted by (vid_num, img_path);
    paths are POSIX-relative to the dataset root (ref df_from_data.py:14-24)."""
    data_path = pathlib.Path(data_path)
    records = []
    for folder in sorted(f for f in data_path.iterdir() if f.is_dir()):
        vid_num = int(folder.name[-2:])  # 'Video01' -> 1
        for image in (folder / "Images").iterdir():
            rel = pathlib.PurePosixPath(folder.name)
            records.append([vid_num,
                            str(rel / "Images" / image.name),
                            str(rel / "Labels" / image.name)])
    records.sort(key=lambda r: (r[0], r[1]))
    return records


def write_cadis_csv(records: list[list], out_path: str | pathlib.Path) -> None:
    import csv
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["vid_num", "img_path", "lbl_path"])
        w.writerows(records)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--path", required=True,
                    help="path to CaDIS 'segmentation' root (VideoXX dirs)")
    ap.add_argument("-o", "--out", default="data/data.csv")
    args = ap.parse_args()
    records = build_cadis_records(args.path)
    write_cadis_csv(records, args.out)
    print(f"{len(records)} records from "
          f"{len({r[0] for r in records})} videos -> {args.out}")


if __name__ == "__main__":
    main()
