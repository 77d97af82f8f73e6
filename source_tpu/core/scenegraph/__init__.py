from .node import (
    ChangeSignal, GEOMETRY, MATERIAL, NodeBase, Node, Primitive, Observer,
    World, print_scenegraph,
)

__all__ = [
    "ChangeSignal", "GEOMETRY", "MATERIAL", "NodeBase", "Node", "Primitive",
    "Observer", "World", "print_scenegraph",
]
