from .engine import Engine, make_optimizer
from .build import build_dataset, build_engine, build_task
