from . import mesh, sharded
