"""Record golden images for tests/test_golden.py.

Renders the deterministic fixtures (GT lambert + GT 1-spp path trace of the
bundled sphere scene) and writes them to tests/golden/. Run on the TPU (the
platform the goldens are pinned to); CPU runs of the tests use a small
tolerance for cross-backend FP differences.

Usage: python scripts/record_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_golden import GOLDEN_DIR, render_fixtures  # noqa: E402

from neural_renderer_tpu.metrics import save_png  # noqa: E402


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, img in render_fixtures().items():
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        save_png(path, img)
        print(f"recorded {path} {img.shape}")


if __name__ == "__main__":
    main()
