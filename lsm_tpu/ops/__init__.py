from . import stencils
