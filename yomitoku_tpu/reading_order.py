"""Reading-order estimation over layout elements.

Reference parity: yomitoku/reading_order.py — build a DAG whose edges link
vertically (or horizontally) overlapping element pairs ordered by y (or x),
skipping pairs that have another element in between, then emit order via a
priority DFS seeded by reading distance.  The DFS has subtle tie-breaking
(pending/open lists, child re-sorting mid-traversal) preserved exactly;
golden tests against reference outputs guard it.
"""

from .utils.graph import Node
from .utils.misc import is_intersected_horizontal, is_intersected_vertical


def _priority_dfs(nodes, direction):
    if len(nodes) == 0:
        return []

    pending_nodes = sorted(nodes, key=lambda x: x.prop["distance"])
    visited = [False] * len(nodes)
    start = pending_nodes.pop(0)
    stack = [start]

    order = []
    open_list = []

    while not all(visited):
        while stack:
            is_updated = False
            current = stack.pop()
            if not visited[current.id]:
                parents = current.parents
                if len(parents) == 0 or all(visited[p.id] for p in parents):
                    visited[current.id] = True
                    order.append(current.id)
                    is_updated = True
                elif current not in open_list:
                    open_list.append(current)

            if is_updated:
                for open_node in reversed(open_list):
                    stack.append(open_node)
                    open_list.remove(open_node)

            if len(current.children) > 0:
                stack.append(current)

            if len(current.children) == 0:
                # steal children of `current` already sitting on the stack
                # and re-push them in reading order
                children = []
                for node in stack:
                    if current in node.parents:
                        children.append(node)
                        stack.remove(node)

                if direction == "top2bottom":
                    children = sorted(
                        children, key=lambda x: x.prop["box"][0], reverse=True
                    )
                else:  # right2left / left2right
                    children = sorted(
                        children, key=lambda x: x.prop["box"][1], reverse=True
                    )

                stack.extend(children)
                continue

            child = current.children.pop(0)
            stack.append(child)

        for node in pending_nodes:
            if node in open_list:
                continue
            stack.append(node)
            pending_nodes.remove(node)
            break
        else:
            if not all(visited) and len(open_list) != 0:
                node = open_list.pop(0)
                visited[node.id] = True
                order.append(node.id)

    return order


def _exist_other_node_between_vertical(node, other_node, nodes):
    for search_node in nodes:
        if search_node is node or search_node is other_node:
            continue
        _, sy1, _, sy2 = search_node.prop["box"]
        _, oy1, _, oy2 = other_node.prop["box"]
        _, ny1, _, ny2 = node.prop["box"]
        if is_intersected_vertical(search_node.prop["box"], node.prop["box"]):
            if ny2 < sy1 < oy1 and ny2 < sy2 < oy1:
                return True
            if oy2 < sy1 < ny1 and oy2 < sy2 < ny1:
                return True
    return False


def _exist_other_node_between_horizontal(node, other_node, nodes):
    for search_node in nodes:
        if search_node is node or search_node is other_node:
            continue
        sx1, _, sx2, _ = search_node.prop["box"]
        ox1, _, ox2, _ = other_node.prop["box"]
        nx1, _, nx2, _ = node.prop["box"]
        if is_intersected_horizontal(search_node.prop["box"], node.prop["box"]):
            if nx2 < sx1 < ox1 and nx2 < sx2 < ox1:
                return True
            if ox2 < sx1 < nx1 and ox2 < sx2 < nx1:
                return True
    return False


def _create_graph_top2bottom(nodes):
    for node in nodes:
        for other_node in nodes:
            if node is other_node:
                continue
            if is_intersected_vertical(node.prop["box"], other_node.prop["box"]):
                if _exist_other_node_between_vertical(node, other_node, nodes):
                    continue
                if node.prop["box"][1] < other_node.prop["box"][1]:
                    node.add_link(other_node)
                else:
                    other_node.add_link(node)
            node.prop["distance"] = node.prop["box"][0] + node.prop["box"][1]
    for node in nodes:
        node.children = sorted(node.children, key=lambda x: x.prop["box"][0])


def _create_graph_right2left(nodes):
    max_x = max(node.prop["box"][2] for node in nodes)
    for node in nodes:
        for other_node in nodes:
            if node is other_node:
                continue
            if is_intersected_horizontal(node.prop["box"], other_node.prop["box"]):
                if _exist_other_node_between_horizontal(node, other_node, nodes):
                    continue
                if node.prop["box"][2] < other_node.prop["box"][2]:
                    other_node.add_link(node)
                else:
                    node.add_link(other_node)
            node.prop["distance"] = (
                max_x - node.prop["box"][2]
            ) + node.prop["box"][1]
    for node in nodes:
        node.children = sorted(node.children, key=lambda x: x.prop["box"][1])


def _create_graph_left2right(nodes, x_weight=1, y_weight=5):
    for node in nodes:
        for other_node in nodes:
            if node is other_node:
                continue
            if is_intersected_horizontal(node.prop["box"], other_node.prop["box"]):
                if _exist_other_node_between_horizontal(node, other_node, nodes):
                    continue
                if other_node.prop["box"][2] < node.prop["box"][2]:
                    other_node.add_link(node)
                else:
                    node.add_link(other_node)
            node.prop["distance"] = (
                node.prop["box"][0] * x_weight + node.prop["box"][1] * y_weight
            )
    for node in nodes:
        node.children = sorted(node.children, key=lambda x: x.prop["box"][1])


def prediction_reading_order(elements, direction, img=None):
    if len(elements) < 2:
        return elements

    nodes = [
        Node(i, element.model_dump()) for i, element in enumerate(elements)
    ]
    if direction == "top2bottom":
        _create_graph_top2bottom(nodes)
    elif direction == "right2left":
        _create_graph_right2left(nodes)
    elif direction == "left2right":
        _create_graph_left2right(nodes)
    else:
        raise ValueError(f"Invalid direction: {direction}")

    order = _priority_dfs(nodes, direction)
    for i, index in enumerate(order):
        elements[index].order = i
    return elements
