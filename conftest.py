# Root conftest: makes pytest put the repo root on sys.path so the package
# imports without installation.
