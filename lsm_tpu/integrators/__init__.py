from .explicit import TimeIntegrator, ForwardEuler, RK2, RK3
from .loop import evolve, rollout, step
