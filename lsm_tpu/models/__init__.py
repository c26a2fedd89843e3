from . import shapes
from . import benchmarks
