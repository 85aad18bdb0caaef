from .layers import ConvConfig, conv_apply, conv_init
from .nbfnet import (
    NBFNetConfig,
    entity_nbfnet_config,
    entity_nbfnet_init,
    entity_nbfnet_score_all,
    rel_nbfnet_apply,
    rel_nbfnet_apply_shared,
    rel_nbfnet_config,
    rel_nbfnet_init,
)
from .ultra import (
    UltraConfig,
    ultra_eval_scores,
    ultra_init,
    ultra_train_scores,
)
from .classic_nbfnet import (
    classic_nbfnet_config,
    classic_nbfnet_init,
    classic_score_all,
    visualize,
)
