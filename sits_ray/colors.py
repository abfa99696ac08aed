"""Label-color registry — analog of the reference's color machinery.

``R/sits_colors.R`` ships a curated land-cover color table with
get/set/reset/show verbs plus a QGIS style export
(``sits_colors_qgis``). Transcript labels are open-ended, so instead of
a bundled table this registry DERIVES a deterministic color per label
(golden-angle hue walk seeded by the label's stable hash → identical
colors across runs, sessions and cluster sizes) and layers user
overrides on top with the same set/reset lifecycle. The QGIS export
emits the real ``color-map`` XML fragment QGIS reads for paletted
rasters.
"""

from __future__ import annotations

import colorsys

import numpy as np
import pandas as pd

# user overrides layered over the derived palette (sits_colors_set/reset)
_OVERRIDES: dict[str, str] = {}

_GOLDEN = 0.6180339887498949  # 1/phi — max-dispersion hue increments


def _derived_color(label: str) -> str:
    """Deterministic hex color: stable 64-bit hash -> golden-angle hue,
    two lightness/saturation bands so adjacent hues still separate."""
    h = int(pd.util.hash_array(np.asarray([label], dtype=object))[0])
    hue = (h % 360) / 360.0
    hue = (hue + _GOLDEN * ((h >> 9) % 7)) % 1.0
    sat = 0.55 + 0.25 * (((h >> 16) % 3) / 2.0)
    val = 0.65 + 0.25 * (((h >> 21) % 3) / 2.0)
    r, g, b = colorsys.hsv_to_rgb(hue, sat, val)
    return "#%02X%02X%02X" % (round(r * 255), round(g * 255), round(b * 255))


def sits_colors(labels=None) -> dict[str, str]:
    """label -> hex mapping (``sits_colors``): overrides win, every other
    label gets its derived deterministic color."""
    if labels is None:
        return dict(_OVERRIDES)
    return {l: _OVERRIDES.get(l, _derived_color(l)) for l in labels}


def sits_colors_set(mapping: dict[str, str]) -> dict[str, str]:
    """Install user colors (``sits_colors_set``); returns the overrides."""
    for lab, col in mapping.items():
        c = str(col)
        if not (c.startswith("#") and len(c) == 7):
            raise ValueError(f"expected '#RRGGBB' hex color, got {col!r}")
        _OVERRIDES[str(lab)] = c.upper()
    return dict(_OVERRIDES)


def sits_colors_reset() -> None:
    """Drop all user overrides (``sits_colors_reset``)."""
    _OVERRIDES.clear()


def sits_colors_show(labels) -> pd.DataFrame:
    """Palette as a table (``sits_colors_show`` without the plot side:
    the data behind the swatch plot)."""
    cmap = sits_colors(labels)
    return pd.DataFrame(
        {"label": list(cmap), "color": [cmap[l] for l in cmap],
         "source": ["user" if l in _OVERRIDES else "derived" for l in cmap]}
    )


def sits_colors_qgis(labels, path: str | None = None) -> str:
    """QGIS paletted-raster ``color-map`` XML for the labels in order
    (``sits_colors_qgis``, ``R/sits_colors.R``): value = 1-based label
    id, the same ids ``kernels/ml.label_max_prob`` emits."""
    cmap = sits_colors(labels)
    items = "\n".join(
        f'      <item alpha="255" value="{i + 1}" color="{cmap[l]}" label="{l}"/>'
        for i, l in enumerate(labels)
    )
    xml = (
        '<rasterrenderer type="paletted" band="1">\n'
        "  <rastershader>\n"
        '    <colorrampshader colorRampType="EXACT">\n'
        f"{items}\n"
        "    </colorrampshader>\n"
        "  </rastershader>\n"
        "</rasterrenderer>\n"
    )
    if path:
        with open(path, "w") as f:
            f.write(xml)
    return xml
