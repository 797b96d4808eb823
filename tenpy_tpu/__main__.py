"""``python -m tenpy_tpu params.yml`` — run a simulation from YAML parameter files.

Rebuild of ``tenpy/__main__.py`` + ``tenpy/__init__.py::console_main`` (:358-418):
multiple YAML files merged, ``-o key=value`` dotted overrides, ``--RAM`` estimate,
optional ``-i module`` imports for custom classes.
"""
import sys

from . import console_main

if __name__ == '__main__':
    sys.exit(console_main())
