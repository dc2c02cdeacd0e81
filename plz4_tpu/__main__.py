"""`python -m plz4_tpu` — the plz4 CLI (reference: cmd/plz4)."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
