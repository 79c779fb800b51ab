"""Render subpackage: integrator, renderer, waves, megakernel.

The top-level API exposes ``vpt.render(scene)`` (README quickstart) while
``volume_path_tracer_tpu.render`` must stay importable as a package
(``import volume_path_tracer_tpu.render.integrator`` and friends). A plain
``from .render.renderer import render`` in the top-level ``__init__`` would
shadow this subpackage with the function, breaking the statement form of
submodule imports — so instead the subpackage itself is callable and
forwards to :func:`renderer.render`.
"""
import sys
import types


class _CallableRenderModule(types.ModuleType):
    def __call__(self, *args, **kwargs):
        from .renderer import render

        return render(*args, **kwargs)

    @property
    def __signature__(self):
        # Keep inspect.signature(vpt.render) meaningful for tooling.
        import inspect

        from .renderer import render

        return inspect.signature(render)


sys.modules[__name__].__class__ = _CallableRenderModule
