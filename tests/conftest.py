import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"

DUDE_HTML = open("/root/reference/examples/dude.html").read() if os.path.exists(
    "/root/reference/examples/dude.html"
) else None


@pytest.fixture(scope="session")
def spark():
    from dude_spark.session import get_spark

    s = get_spark(app_name="dude_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def scraper():
    from dude_spark.api import Scraper

    app = Scraper()

    @app.group(css=".custom-group")
    @app.select(css=".title")
    def title(element):
        return {"title": element.text_content()}

    @app.select(css=".title", group_css=".custom-group")
    def empty(element):
        return {}

    @app.group(css=".custom-group")
    @app.select(css=".title", url_match="example.com")
    def url_dont_match(element):
        return {"title": element.text_content()}

    @app.select(css=".url", group_css=".custom-group")
    def url(element):
        return {"url": element["href"]}

    return app


@pytest.fixture()
def dude_html():
    if DUDE_HTML is None:
        pytest.skip("reference fixture not available")
    return DUDE_HTML
