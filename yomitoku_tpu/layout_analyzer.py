"""LayoutAnalyzer pipeline: layout parse -> table structure recognition.

Reference parity: yomitoku/layout_analyzer.py:7-49.
"""

from .layout_parser import LayoutParser
from .schemas import LayoutAnalyzerSchema
from .table_structure_recognizer import TableStructureRecognizer


class LayoutAnalyzer:
    def __init__(self, configs=None, device="tpu", visualize=False,
                 num_devices=None):
        configs = configs or {}
        if not isinstance(configs, dict):
            raise ValueError("configs must be a dict.")
        lp_kwargs = {"device": device, "visualize": visualize,
                     "num_devices": num_devices}
        tsr_kwargs = dict(lp_kwargs)
        lp_kwargs.update(configs.get("layout_parser", {}))
        tsr_kwargs.update(configs.get("table_structure_recognizer", {}))

        self.layout_parser = LayoutParser(**lp_kwargs)
        self.table_structure_recognizer = TableStructureRecognizer(**tsr_kwargs)

    def __call__(self, img, page=None):
        layout_results, vis = self.layout_parser(img, page=page)
        table_boxes = [table.box for table in layout_results.tables]
        table_results, vis = self.table_structure_recognizer(
            img, table_boxes, vis=vis, page=page
        )
        return (
            LayoutAnalyzerSchema(
                paragraphs=layout_results.paragraphs,
                tables=table_results,
                figures=layout_results.figures,
            ),
            vis,
        )
