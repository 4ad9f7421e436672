# Makes tools/ importable from tests (tests/conftest.py puts the repo
# root on sys.path); the scripts themselves are still run as
# `python tools/<name>.py`.
