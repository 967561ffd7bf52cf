from .params import RenderParams
from .renderer import RenderBasis, Renderer
