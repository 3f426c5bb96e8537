from mvs_tpu.nn.blocks import ConvBlock, ConvTransposeBlock, Norm
from mvs_tpu.nn.feature_nets import (
    AttentionConv, CascadeFeatureNet, MVSNetFeatureNet, PyramidFeatureNet,
)
from mvs_tpu.nn.cost_reg import PyramidCostRegNet, UNetCostRegNet

__all__ = [
    "ConvBlock", "ConvTransposeBlock", "Norm",
    "AttentionConv", "CascadeFeatureNet", "MVSNetFeatureNet", "PyramidFeatureNet",
    "PyramidCostRegNet", "UNetCostRegNet",
]
