"""
Resource location (cf. reference ``pisa/utils/resources.py:38``).

Search order for a relative resource path:
1. current working directory
2. each directory on the ``PISA_TPU_RESOURCES`` env var (colon-separated)
3. the packaged ``pisa_tpu/resources`` directory
"""

import os

__all__ = ["find_resource", "open_resource", "RESOURCES_DIR"]

RESOURCES_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")


def _search_dirs():
    yield os.getcwd()
    env = os.environ.get("PISA_TPU_RESOURCES", "")
    for d in env.split(":"):
        if d:
            yield os.path.expanduser(os.path.expandvars(d))
    yield RESOURCES_DIR


def find_resource(resource, fail=True):
    """Locate `resource`, returning its absolute path, or None if not found
    and ``fail=False``."""
    if resource is None:
        if fail:
            raise IOError("Cannot locate resource None")
        return None
    resource = os.path.expanduser(os.path.expandvars(str(resource)))
    if os.path.isabs(resource):
        if os.path.exists(resource):
            return resource
    else:
        for base in _search_dirs():
            candidate = os.path.join(base, resource)
            if os.path.exists(candidate):
                return candidate
    if fail:
        raise IOError(f"Could not find resource {resource!r}")
    return None


def open_resource(resource, mode="r"):
    return open(find_resource(resource), mode)
