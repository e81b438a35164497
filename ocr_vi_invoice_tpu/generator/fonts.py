"""Font management for the synthetic invoice generator.

The reference's FontManager scans a ``synthetic_data/fonts`` tree that is
absent from its snapshot (`generator/det/layouts/base_layout.py:77-160` —
a latent defect noted in SURVEY.md §2.3). Here fonts come from the system
(DejaVu ships everywhere and fully covers Vietnamese) plus any user dirs,
with Vietnamese glyph coverage verified through fontTools cmaps.
"""

from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path
from typing import Dict, Optional, Sequence

from PIL import ImageFont

# Representative Vietnamese code points a usable font must cover.
_VN_PROBE = "ăâđêôơưếềệỗớợúứữỷỹẠẢẤẰẴ"

_SYSTEM_DIRS = [
    "/usr/share/fonts/truetype",
    "/usr/share/fonts",
    os.path.expanduser("~/.fonts"),
]

# Style roles the layouts ask for.
ROLES = ("sans", "serif", "mono", "sans_bold", "serif_bold", "mono_bold",
         "handwriting")

_DEJAVU = {
    "sans": "dejavu/DejaVuSans.ttf",
    "serif": "dejavu/DejaVuSerif.ttf",
    "mono": "dejavu/DejaVuSansMono.ttf",
    "sans_bold": "dejavu/DejaVuSans-Bold.ttf",
    "serif_bold": "dejavu/DejaVuSerif-Bold.ttf",
    "mono_bold": "dejavu/DejaVuSansMono-Bold.ttf",
    # no handwriting font ships with the image; oblique sans approximates it
    "handwriting": "dejavu/DejaVuSans.ttf",
}


def _covers_vietnamese(path: str) -> bool:
    try:
        from fontTools.ttLib import TTFont

        cmap = TTFont(path, fontNumber=0, lazy=True).getBestCmap()
        return all(ord(c) in cmap for c in _VN_PROBE)
    except Exception:
        return False


class FontManager:
    """Resolves style roles to font file paths with Vietnamese coverage."""

    def __init__(self, extra_dirs: Optional[Sequence[str]] = None):
        self.paths: Dict[str, str] = {}
        base = None
        for d in _SYSTEM_DIRS:
            if Path(d, "dejavu/DejaVuSans.ttf").exists():
                base = Path(d)
                break
        for role, rel in _DEJAVU.items():
            if base is not None and (base / rel).exists():
                self.paths[role] = str(base / rel)
        # User dirs can override/extend roles by filename convention.
        for d in extra_dirs or []:
            for f in sorted(Path(d).glob("**/*.[ot]tf")):
                if not _covers_vietnamese(str(f)):
                    continue
                name = f.stem.lower()
                for role in ROLES:
                    if role.replace("_", "") in name.replace("-", "").replace("_", ""):
                        self.paths[role] = str(f)

    @lru_cache(maxsize=256)
    def get(self, role: str = "sans", size: int = 20) -> ImageFont.FreeTypeFont:
        path = self.paths.get(role) or self.paths.get("sans")
        if path is None:
            return ImageFont.load_default()
        return ImageFont.truetype(path, size)


class RemappedFonts:
    """Role indirection over a FontManager: ``get(role)`` resolves
    through ``remap`` first. Used by the domain-shift holdout profiles
    (`generator.apply_holdout_profile`) to exclude a font family from
    training data (serif -> sans) or force it in the shifted eval set
    (sans -> serif) without touching the layouts."""

    def __init__(self, base: FontManager, remap: Dict[str, str]):
        self.base = base
        self.remap = dict(remap)

    def get(self, role: str = "sans", size: int = 20):
        return self.base.get(self.remap.get(role, role), size)


_default: Optional[FontManager] = None


def default_fonts() -> FontManager:
    global _default
    if _default is None:
        _default = FontManager()
    return _default
