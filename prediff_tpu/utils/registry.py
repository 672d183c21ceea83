"""Name -> object registry (reference parity: src/prediff/utils/registry.py:24).

Used for attention-pattern lookup and any user-extensible component family.
"""
from typing import Any, Callable, Dict, Optional


class Registry:
    """A simple string-keyed registry supporting decorator and call styles.

    >>> MODELS = Registry("models")
    >>> @MODELS.register()
    ... def my_model(): ...
    >>> MODELS.register("alias", my_model)
    >>> MODELS.get("my_model") is my_model
    True
    """

    def __init__(self, name: str):
        self._name = name
        self._registry: Dict[str, Any] = {}

    @property
    def name(self) -> str:
        return self._name

    def __contains__(self, key: str) -> bool:
        return key in self._registry

    def __len__(self) -> int:
        return len(self._registry)

    def list_keys(self):
        return sorted(self._registry.keys())

    def register(self, name_or_obj: Optional[Any] = None, obj: Optional[Any] = None):
        # usage 1: register("name", obj)
        if obj is not None:
            return self._do_register(name_or_obj, obj)
        # usage 2: @register() or @register("name")
        if name_or_obj is None or isinstance(name_or_obj, str):
            name = name_or_obj

            def deco(fn_or_cls: Callable):
                self._do_register(name or fn_or_cls.__name__, fn_or_cls)
                return fn_or_cls

            return deco
        # usage 3: register(obj)
        return self._do_register(name_or_obj.__name__, name_or_obj)

    def _do_register(self, name: str, obj: Any):
        if name in self._registry:
            raise KeyError(f"'{name}' already registered in registry '{self._name}'")
        self._registry[name] = obj
        return obj

    def get(self, name: str) -> Any:
        if name not in self._registry:
            raise KeyError(
                f"'{name}' not found in registry '{self._name}'. "
                f"Available: {self.list_keys()}"
            )
        return self._registry[name]

    def create(self, name: str, *args, **kwargs) -> Any:
        return self.get(name)(*args, **kwargs)
