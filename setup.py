"""Shim for environments whose setuptools predates a bundled wheel
backend (PEP 660 editable installs need the `wheel` package until
setuptools 70): `python setup.py develop` / `pip install -e .
--no-use-pep517` fall back to this. All metadata lives in
pyproject.toml."""

from setuptools import setup

setup()
