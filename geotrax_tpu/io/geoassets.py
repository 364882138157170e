"""Geo-asset loading: orthophotos, geo-parameters, master frames, lane
segmentation.

Parity with reference georeference.py:300-448: three interchangeable sources
of the ortho affine parameters (GeoTIFF tags 33922 ModelTiepoint /
33550 ModelPixelScale / 34264 ModelTransformation; a plain .txt; or the
Songdo 'center-text-file' cutout math), auto-detected from the files present;
segmentation CSVs with 10 columns (section, lane, 4 corner points).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional, Union

import numpy as np
import pandas as pd


def load_image(path: Path) -> np.ndarray:
    """(H,W,3) uint8 RGB image."""
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"))


def save_image(path: Path, rgb: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(rgb).save(path)


def read_ortho_config_file(filepath: Path) -> np.ndarray:
    """Whitespace-separated numbers, '#' comments ignored."""
    values = []
    with open(filepath, "r") as fh:
        for line in fh:
            stripped = line.strip()
            if stripped and not stripped.startswith("#"):
                values.extend(float(tok) for tok in stripped.split())
    return np.asarray(values)


def get_geo_params_source(
    geo_source: Optional[str], ortho_folder: Path, location_id: str, logger: logging.Logger
) -> str:
    """Auto-detect (or validate) which geo-parameter source applies; converts
    a lone .tif into the .png the rest of the pipeline uses."""
    if geo_source is not None:
        if geo_source not in ("metadata-tif", "text-file", "center-text-file"):
            logger.critical(f"Invalid --geo-source '{geo_source}'.")
            sys.exit(1)
        return geo_source

    base = ortho_folder / f"{location_id}.png"
    tif = base.with_suffix(".tif")
    txt = base.with_suffix(".txt")
    center = base.with_name(f"{location_id}_center.txt")
    params = base.with_name("ortho_parameters.txt")

    if tif.exists() and (txt.exists() or (center.exists() and params.exists())):
        logger.error(f"Both .tif and .txt geo sources present for '{base}'; use --geo-source.")
        sys.exit(1)
    if tif.exists():
        if not base.exists():
            logger.warning(f"Converting '{tif}' to '{base}'.")
            save_image(base, load_image(tif))
        return "metadata-tif"
    if txt.exists() and center.exists() and params.exists():
        logger.error(f"Both '.txt' and '_center.txt' present for '{base}'; use --geo-source.")
        sys.exit(1)
    if txt.exists():
        return "text-file"
    if center.exists() and params.exists():
        return "center-text-file"
    logger.error(f"No georeferencing parameters found for '{base}'.")
    sys.exit(1)


def get_ortho_parameters(
    ortho_folder: Path,
    location_id: str,
    geo_source: str,
    cutout_width_px: Optional[int],
    logger: logging.Logger,
) -> tuple:
    """(lng0, lat0, dlng, dlat, skew_x, skew_y): the affine mapping ortho px
    -> geographic degrees (reference get_ortho_parameters, :318-369)."""
    base = ortho_folder / f"{location_id}.png"

    if geo_source == "metadata-tif":
        from PIL import Image, TiffImagePlugin

        with Image.open(base.with_suffix(".tif")) as tif:
            if not isinstance(tif, TiffImagePlugin.TiffImageFile):
                logger.error(f"Cannot read GeoTIFF tags from '{base.with_suffix('.tif')}'.")
                sys.exit(1)
            tags = tif.tag_v2
            if 33922 in tags and 33550 in tags:
                tiepoint = tags[33922]
                scale = tags[33550]
                lng0, lat0 = float(tiepoint[3]), float(tiepoint[4])
                dlng, dlat = float(scale[0]), -float(scale[1])
                skew_x = skew_y = 0.0
                if 34264 in tags:
                    # ModelTransformation is 4x4 row-major: X' row is t[0..3],
                    # Y' row is t[4..7] — skew_y lives at t[4] (t[2] is the
                    # always-zero z coefficient of X)
                    transform = tags[34264]
                    skew_x, skew_y = float(transform[1]), float(transform[4])
            elif 34264 in tags:
                # transformation-only GeoTIFF (e.g. gdalwarp with rotation
                # writes ModelTransformation INSTEAD of tiepoint+scale)
                t = tags[34264]
                dlng, skew_x, lng0 = float(t[0]), float(t[1]), float(t[3])
                skew_y, dlat, lat0 = float(t[4]), float(t[5]), float(t[7])
            else:
                logger.critical(
                    f"GeoTIFF '{base.with_suffix('.tif')}' has neither "
                    "ModelTiepoint+ModelPixelScale nor ModelTransformation tags."
                )
                sys.exit(1)
        return lng0, lat0, dlng, dlat, skew_x, skew_y

    if geo_source == "text-file":
        vals = read_ortho_config_file(base.with_suffix(".txt"))
        lng0, lat0, dlng, dlat = vals[:4]
        skew_x, skew_y = (vals[4], vals[5]) if len(vals) >= 6 else (0.0, 0.0)
        return float(lng0), float(lat0), float(dlng), float(dlat), float(skew_x), float(skew_y)

    if geo_source == "center-text-file":
        # The Songdo cutouts: <loc>_center.txt gives the cutout center in the
        # big ortho mosaic; ortho_parameters.txt the mosaic's affine. The
        # cutout's top-left anchor and (rescaled) pixel sizes follow.
        center = read_ortho_config_file(base.with_name(f"{location_id}_center.txt"))
        cx, cy = float(center[0]), float(center[1])
        from PIL import Image

        if not base.exists():
            logger.critical(f"Orthophoto '{base}' not found.")
            sys.exit(1)
        with Image.open(base) as img:
            ortho_width_px = img.size[0]
        width_half = (cutout_width_px if cutout_width_px is not None else ortho_width_px) // 2

        vals = read_ortho_config_file(base.with_name("ortho_parameters.txt"))
        lngs, lats, dlng, dlat = (float(v) for v in vals[:4])
        skew_x, skew_y = (float(vals[4]), float(vals[5])) if len(vals) >= 6 else (0.0, 0.0)

        lng0 = lngs + (cx - width_half) * dlng + (cy - width_half) * skew_x
        lat0 = lats + (cy - width_half) * dlat + (cx - width_half) * skew_y

        if cutout_width_px is not None and cutout_width_px != ortho_width_px:
            scale = cutout_width_px / ortho_width_px
            dlng, dlat, skew_x, skew_y = (p * scale for p in (dlng, dlat, skew_x, skew_y))
        return lng0, lat0, dlng, dlat, skew_x, skew_y

    logger.error(f"Invalid geo_source '{geo_source}'.")
    sys.exit(1)


def get_orthophoto(ortho_folder: Path, location_id: str, logger: logging.Logger) -> np.ndarray:
    path = ortho_folder / f"{location_id}.png"
    if not path.exists():
        logger.critical(f"Orthophoto file '{path}' not found.")
        sys.exit(1)
    img = load_image(path)
    logger.info(f"Loaded orthophoto '{path}' with shape {img.shape}.")
    return img


def get_master_frame(
    ortho_folder: Path, master_folder: Optional[Path], location_id: str, logger: logging.Logger
) -> np.ndarray:
    folder = master_folder if master_folder is not None else ortho_folder / "master_frames"
    path = Path(folder) / f"{location_id}.png"
    if not path.exists():
        logger.error(f"Master frame '{path}' not found; use --no-master to skip the master path.")
        sys.exit(1)
    logger.info(f"Loaded master frame '{path}'.")
    return load_image(path)


def get_road_section_lane_geometry(
    ortho_folder: Path, segmentation_folder: Optional[Path], location_id: str, logger: logging.Logger
) -> pd.DataFrame:
    folder = segmentation_folder if segmentation_folder is not None else ortho_folder / "segmentations"
    path = Path(folder) / f"{location_id}.csv"
    if path.exists():
        logger.info(f"Loaded lane geometry from '{path}'.")
        return pd.read_csv(path).iloc[:, :10]
    logger.warning(f"No segmentation file at '{path}'; road section/lane not assigned.")
    return pd.DataFrame()
