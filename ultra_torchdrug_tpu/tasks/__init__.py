from .kg import (
    bce_self_adversarial,
    evaluate_ranking,
    filtered_ranking,
    toy_eval_ranking,
)
from .task import (
    ClassicNBFNetTask,
    InductiveKGTask,
    MultiGraphPretrainTask,
    TaskConfig,
    TransductiveKGTask,
)
