from .pallas_sim import (neighborhood_similarity,
                         pallas_neighborhood_similarity,
                         xla_neighborhood_similarity)
from .point_sample import point_sample
from .resize import adaptive_avg_pool_1x1, resize
from .unfold import unfold_neighbors, unfold_valid_mask

__all__ = [
    'resize', 'adaptive_avg_pool_1x1', 'unfold_neighbors',
    'unfold_valid_mask', 'neighborhood_similarity',
    'pallas_neighborhood_similarity', 'xla_neighborhood_similarity'
]
