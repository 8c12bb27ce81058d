from collections import OrderedDict

from torch import nn


class IntermediateLayerGetter(nn.ModuleDict):
    """Wraps a model to return intermediate named-child outputs
    (torchvision.models._utils semantics: stops after the last requested layer)."""

    def __init__(self, model: nn.Module, return_layers):
        if not set(return_layers).issubset([name for name, _ in model.named_children()]):
            raise ValueError("return_layers are not present in model")
        orig_return_layers = {str(k): str(v) for k, v in return_layers.items()}
        return_layers = dict(orig_return_layers)
        layers = OrderedDict()
        for name, module in model.named_children():
            layers[name] = module
            if name in return_layers:
                del return_layers[name]
            if not return_layers:
                break
        super().__init__(layers)
        self.return_layers = orig_return_layers

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out
