from .indoor_eval import indoor_eval
