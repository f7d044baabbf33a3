"""Regenerate tests/golden/ after an intentional numerics change:
    python tests/regen_golden.py
"""

from pathlib import Path

if __name__ == "__main__":
    golden = Path(__file__).parent / "golden"
    for f in golden.glob("*.json"):
        f.unlink()
        print(f"removed {f}")
    print("now run: python -m pytest tests/test_resume_and_golden.py "
          "-q  (twice: first run regenerates, second asserts)")
