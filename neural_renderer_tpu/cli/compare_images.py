"""compare_images CLI: PSNR + FLIP between two images.

(ref: /root/reference/src/compare_images.cu). Keeps the Y-flip
auto-detection: if flipping the test image improves PSNR by > 3 dB, the
flipped orientation is used (compare_images.cu:41-49).

Usage: python -m neural_renderer_tpu.cli.compare_images <ref> <test> [flip.png]
"""

from __future__ import annotations

import sys

from ..metrics import compute_flip, compute_psnr, flip_vertically, load_image


def main(argv=None) -> int:
    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(f"Usage: compare_images <reference_image> <test_image> [flip_output.png]",
              file=sys.stderr)
        print("  Computes PSNR and FLIP metrics between two images.", file=sys.stderr)
        print("  Optionally saves FLIP error visualization to third argument.",
              file=sys.stderr)
        return 1

    ref_path, test_path = argv[0], argv[1]
    flip_output = argv[2] if len(argv) >= 3 else None

    print("=== Image Comparison Tool ===")
    print(f"Reference: {ref_path}")
    print(f"Test:      {test_path}")

    ref = load_image(ref_path)
    print(f"Loaded reference: {ref.shape[1]}x{ref.shape[0]}")
    test = load_image(test_path)
    print(f"Loaded test:      {test.shape[1]}x{test.shape[0]}")

    if ref.shape != test.shape:
        print("Error: Image dimensions do not match!", file=sys.stderr)
        print(f"  Reference: {ref.shape[1]}x{ref.shape[0]}", file=sys.stderr)
        print(f"  Test:      {test.shape[1]}x{test.shape[0]}", file=sys.stderr)
        return 1

    psnr_no_flip = compute_psnr(ref, test)
    test_flipped = flip_vertically(test)
    psnr_flip_y = compute_psnr(ref, test_flipped)
    if psnr_flip_y > psnr_no_flip + 3.0:
        test = test_flipped
        print(f"Detected Y-flipped test image (PSNR {psnr_no_flip:.2f} -> "
              f"{psnr_flip_y:.2f} dB). Using flipped orientation.")

    print("\n=== Computing Metrics ===")
    psnr = compute_psnr(ref, test)
    print(f"PSNR: {psnr:.2f} dB")

    mean_err, max_err = compute_flip(ref, test, output_path=flip_output,
                                     device="cpu")
    print(f"FLIP max error: {max_err:.4f}")
    print(f"FLIP: {mean_err:.4f} (mean)")
    print("\nComparison complete.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
