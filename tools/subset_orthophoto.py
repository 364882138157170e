"""Square cutouts from large orthophotos around geographic or pixel centers.

Capability parity with reference tools/subset_orthophoto.py (180 ln): given a
city-scale orthophoto GeoTIFF and a JSON location dictionary
``{"U": [lat, lng], ...}``, convert each location to mosaic pixels through the
GeoTIFF ModelTiepoint/ModelPixelScale tags, crop a ``--crop-size`` square
around it WITHOUT loading the mosaic into RAM (first-party tiled-window reads,
geotrax_tpu/io/tiff_tiled.py — the analog of the reference's tifffile tile
loop), downscale by ``--scale-factor`` and write:

- ``<loc>.png``             the cutout the georeference stage registers against
- ``<loc>_center.txt``      cutout center in mosaic pixel coordinates
- ``ortho_parameters.txt``  (lng_0, lat_0, lng_scale, -lat_scale)

Non-tiled/exotic TIFFs and PNG mosaics fall back to a whole-image PIL load.
A second input mode (``--centers "U=cx,cy"``) takes mosaic PIXEL centers
directly for mosaics without geo metadata.

Usage:
  python tools/subset_orthophoto.py --orthophoto-filepath ortho.tif \
      --ortho-cutout-folder out/ --location-dict-filepath locations.json \
      [--crop-size 15000] [--scale-factor 0.533]
  python tools/subset_orthophoto.py --orthophoto-filepath mosaic.png \
      --ortho-cutout-folder out/ --centers "U=7000,6000" --crop-size 15000
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from _common import *  # noqa: F401,F403 — sys.path setup

from geotrax_tpu.utils.logging_utils import setup_logger  # noqa: E402


def _downscale(image: np.ndarray, factor: float) -> np.ndarray:
    """cv2 INTER_AREA like the reference; PIL reduce-style box filter as the
    dependency-free fallback."""
    if factor == 1.0:
        return image
    out_w = int(round(image.shape[1] * factor))
    out_h = int(round(image.shape[0] * factor))
    try:
        import cv2

        return cv2.resize(image, (out_w, out_h), interpolation=cv2.INTER_AREA)
    except ImportError:
        from PIL import Image

        return np.asarray(
            Image.fromarray(image).resize((out_w, out_h), Image.BOX)
        )


class _MosaicSource:
    """Windowed access to the mosaic: tiled-TIFF partial reads when possible,
    else one whole-image PIL load shared by all crops."""

    def __init__(self, path: Path, logger):
        self.tiled = None
        self.full = None
        self.geo = None
        try:
            from geotrax_tpu.io.tiff_tiled import open_tiled_tiff

            self.tiled = open_tiled_tiff(path)
            self.geo = self.tiled.geo_params()
            self.height, self.width = self.tiled.length, self.tiled.width
            logger.info(
                f"Tiled mosaic {self.width}x{self.height}: windowed reads "
                f"({self.tiled.tile_width}px tiles)."
            )
        except ValueError:
            from PIL import Image

            Image.MAX_IMAGE_PIXELS = None
            with Image.open(path) as img:
                self.geo = _pil_geo_params(img)
                self.full = np.asarray(img.convert("RGB"))
            self.height, self.width = self.full.shape[:2]
            logger.info(
                f"Mosaic {self.width}x{self.height} loaded whole "
                "(not a supported tiled TIFF)."
            )

    def crop(self, i0: int, j0: int, h: int, w: int) -> np.ndarray:
        if self.tiled is not None:
            rgb = self.tiled.read_window(i0, j0, h, w)
            return rgb[..., :3] if rgb.shape[-1] >= 3 else np.repeat(rgb, 3, -1)
        if (i0 < 0 or j0 < 0 or i0 + h > self.height or j0 + w > self.width):
            raise ValueError(
                f"Requested crop [({i0},{i0 + h}),({j0},{j0 + w})] is out of "
                f"image bounds ({self.height},{self.width})"
            )
        return self.full[i0:i0 + h, j0:j0 + w]


def _pil_geo_params(img):
    """GeoTIFF tags through PIL for files the tiled parser rejected."""
    tags = getattr(img, "tag_v2", None)
    if tags is None or 33922 not in tags or 33550 not in tags:
        return None
    tie, scale = tags[33922], tags[33550]
    return float(tie[3]), float(tie[4]), float(scale[0]), float(scale[1])


def process_ortho(args, logger) -> int:
    mosaic = _MosaicSource(args.orthophoto_filepath, logger)
    out = args.ortho_cutout_folder
    out.mkdir(parents=True, exist_ok=True)

    # location name -> mosaic pixel center
    centers: dict[str, tuple[int, int]] = {}
    if args.location_dict_filepath is not None:
        if mosaic.geo is None:
            logger.error(
                "Mosaic has no GeoTIFF ModelTiepoint/ModelPixelScale tags; "
                "use --centers with pixel coordinates instead."
            )
            return 1
        lng_0, lat_0, lng_scale, lat_scale = mosaic.geo
        np.savetxt(out / "ortho_parameters.txt",
                   np.array([lng_0, lat_0, lng_scale, -lat_scale]))
        location_dict = json.loads(Path(args.location_dict_filepath).read_text())
        for location, (lat, lng) in location_dict.items():
            centers[location] = (
                int((lng - lng_0) / lng_scale),
                -int((lat - lat_0) / lat_scale),
            )
    for entry in args.centers or []:
        location, coords = entry.split("=")
        cx, cy = (int(v) for v in coords.split(","))
        centers[location] = (cx, cy)
    if not centers:
        logger.error("No locations given: pass --location-dict-filepath or --centers.")
        return 1

    half = args.crop_size // 2
    failed = 0
    from PIL import Image

    for location, (p_x, p_y) in centers.items():
        try:
            cropped = mosaic.crop(p_y - half, p_x - half,
                                  args.crop_size, args.crop_size)
            resized = _downscale(cropped, args.scale_factor)
            Image.fromarray(np.ascontiguousarray(resized)).save(out / f"{location}.png")
        except (ValueError, OSError) as exc:
            logger.error(f"{location}: {exc}")
            failed += 1
            continue
        # only after the .png is on disk: a dangling <loc>_center.txt without
        # its image would feed the georeference stage a half-built location
        np.savetxt(out / f"{location}_center.txt", np.array([p_x, p_y]))
        logger.notice(f"Processed and saved orthophoto for intersection: {location}")
    return 1 if failed else 0


def parse_cli_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Subset large orthophotos around specified geographic locations."
    )
    parser.add_argument("--orthophoto-filepath", type=Path, required=True,
                        help="Orthophoto file to be subsetted (GeoTIFF/PNG)")
    parser.add_argument("--ortho-cutout-folder", type=Path, required=True,
                        help="Output folder for cutouts and meta files")
    parser.add_argument("--location-dict-filepath", type=Path, default=None,
                        help="JSON mapping location name -> [lat, lng]")
    parser.add_argument("--centers", nargs="+", default=None,
                        help="LOC=cx,cy entries in mosaic PIXEL coordinates "
                             "(mosaics without geo metadata)")
    parser.add_argument("--crop-size", type=int, default=15000,
                        help="Square crop size of the orthophoto (in pixels)")
    parser.add_argument("--scale-factor", type=float, default=8 / 15,
                        help="Downscale factor applied before saving")
    parser.add_argument("--log-path", "-lp", type=Path, default=None)
    parser.add_argument("--quiet", "-q", action="store_true")
    return parser.parse_args()


def main() -> int:
    args = parse_cli_args()
    logger = setup_logger(Path(__file__).stem, verbose=not args.quiet,
                          log_path=args.log_path)
    return process_ortho(args, logger)


if __name__ == "__main__":
    raise SystemExit(main())
