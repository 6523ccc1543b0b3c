"""Root conftest: puts the repo root on sys.path for test imports."""
