"""Demo predictor helpers (role of reference demo/predictor.py:1-219):
``VisualizationDemo`` (single image/video visualization) and
``AsyncPredictor``.  The reference's AsyncPredictor spawns one worker process
per GPU; on TPU the device is driven by one process, so async means a
background thread pipelining host pre/post-processing with device compute.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from fsgd_tpu.data.catalog import MetadataCatalog
from fsgd_tpu.engine import DefaultPredictor
from fsgd_tpu.utils.video_visualizer import VideoVisualizer
from fsgd_tpu.utils.visualizer import ColorMode, Visualizer


class VisualizationDemo:
    def __init__(self, cfg, instance_mode=ColorMode.IMAGE, parallel=False):
        self.metadata = MetadataCatalog.get(
            cfg.DATASETS.TEST[0] if len(cfg.DATASETS.TEST) else "__unused"
        )
        self.instance_mode = instance_mode
        self.parallel = parallel
        if parallel:
            self.predictor = AsyncPredictor(cfg)
        else:
            self.predictor = DefaultPredictor(cfg)

    def run_on_image(self, image):
        """image: BGR uint8 (H, W, 3).  Returns (predictions, VisImage)."""
        predictions = self.predictor(image)
        image_rgb = image[:, :, ::-1]
        visualizer = Visualizer(image_rgb, self.metadata, instance_mode=self.instance_mode)
        vis_output = None
        if "instances" in predictions:
            vis_output = visualizer.draw_instance_predictions(predictions["instances"].numpy())
        elif "sem_seg" in predictions:
            vis_output = visualizer.draw_sem_seg(np.asarray(predictions["sem_seg"]).argmax(axis=-1))
        return predictions, vis_output

    def run_on_video(self, frames):
        """Iterate BGR frames -> visualized RGB frames."""
        video_visualizer = VideoVisualizer(self.metadata, self.instance_mode)
        for frame in frames:
            predictions = self.predictor(frame)
            if "instances" in predictions:
                yield video_visualizer.draw_instance_predictions(
                    frame[:, :, ::-1], predictions["instances"].numpy()
                ).get_image()
            else:
                yield frame[:, :, ::-1]


class AsyncPredictor:
    """Thread-pipelined predictor: host decode/visualize overlaps device compute."""

    class _StopToken:
        pass

    def __init__(self, cfg, num_workers: int = 1):
        self.task_queue = queue.Queue(maxsize=max(num_workers * 3, 3))
        self.result_queue = queue.Queue(maxsize=max(num_workers * 3, 3))
        self.predictor = DefaultPredictor(cfg)
        self.put_idx = 0
        self.get_idx = 0
        self.result_buffer = {}
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        while True:
            task = self.task_queue.get()
            if isinstance(task, AsyncPredictor._StopToken):
                break
            idx, image = task
            result = self.predictor(image)
            self.result_queue.put((idx, result))

    def put(self, image):
        self.put_idx += 1
        self.task_queue.put((self.put_idx, image))

    def get(self):
        self.get_idx += 1
        if self.get_idx in self.result_buffer:
            return self.result_buffer.pop(self.get_idx)
        while True:
            idx, result = self.result_queue.get()
            if idx == self.get_idx:
                return result
            self.result_buffer[idx] = result

    def __call__(self, image):
        self.put(image)
        return self.get()

    def __len__(self):
        return self.put_idx - self.get_idx

    def shutdown(self):
        self.task_queue.put(AsyncPredictor._StopToken())
