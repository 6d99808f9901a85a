"""Network modules (maps reference layer L4: ``network/``)."""

from threepu.models.layers import (DenseConv, DenseEdgeConv,
                                   SampledDenseEdgeConv)
from threepu.models.upsampler import (Level, Net, AdaptiveLevel,
                                      exponential_distance, gen_grid,
                                      gen_1d_grid)

__all__ = [
    "DenseConv", "DenseEdgeConv", "SampledDenseEdgeConv",
    "Level", "Net", "AdaptiveLevel",
    "exponential_distance", "gen_grid", "gen_1d_grid",
]
