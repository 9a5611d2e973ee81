"""Gallery plot of hand-picked qualitative examples per CD-FSOD dataset.

Port of reference tools/make_plots/grid-images-plot.py (which is not
importable as-is — `NEU-DET = [...]` is a syntax error in the snapshot; the
curated file lists and the per-image rendering are preserved here with valid
identifiers). Renders the listed images of a COCO-format json via
plot_reference_images.

Usage:
    python tools/make_plots/grid_images_plot.py \
        --dataset neu_det --json_path ann.json --image_dir imgs/ \
        --output_dir out/
"""
import argparse

from tools.make_plots.plot_reference_images import plot_reference_images

# Curated qualitative galleries (reference grid-images-plot.py:11-56).
GALLERIES = {
    "neu_det": [
        "inclusion_14.png", "inclusion_120.png", "inclusion_141.png",
        "inclusion_191.png", "patches_283.png", "pitted_surface_24.png",
        "scratches_62.png", "scratches_286.png", "rolled-in_scale_56.png",
        "rolled-in_scale_41.png",
    ],
    "uodd": ["001812.jpg", "003210.jpg", "003178.jpg"],
    # NB the reference list has a missing comma ('10286.jpg' '10262.jpg'
    # concatenate); both files are kept as separate entries here.
    "dior": ["05626.jpg", "10319.jpg", "10308.jpg", "10286.jpg",
             "10262.jpg", "10285.jpg"],
    "dior_failures": ["10278.jpg"],
    "clipart1k": [
        "83363463.jpg", "84603130.jpg", "87584798.jpg", "91462156.jpg",
        "184193092.jpg", "237877045.jpg", "363764070.jpg", "377456470.jpg",
        "450070519.jpg", "450327547.jpg",
    ],
}


def main():
    p = argparse.ArgumentParser(description="Curated qualitative galleries")
    p.add_argument("--dataset", choices=sorted(GALLERIES), required=True)
    p.add_argument("--json_path", required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--dataset_name", default=None,
                   help="palette name (defaults to --dataset)")
    a = p.parse_args()
    out = plot_reference_images(
        a.json_path, a.image_dir, a.output_dir,
        dataset_name=a.dataset_name or a.dataset,
        file_names=set(GALLERIES[a.dataset]))
    print(f"wrote {len(out)} panels to {a.output_dir}")


if __name__ == "__main__":
    main()
