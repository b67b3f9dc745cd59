# Namespace package for the minimal pure-python protobuf runtime shim
# (see google/protobuf/__init__.py). Only ever importable when the real
# protobuf distribution is absent and the engine added this directory to
# sys.path explicitly.
__path__ = __import__("pkgutil").extend_path(__path__, __name__)
