package org.xmlpull.v1;

/** Compile-only shim; see XmlPullParser. Never thrown in the golden test. */
public class XmlPullParserException extends Exception {
    public XmlPullParserException(String msg) { super(msg); }

    public XmlPullParserException(String msg, XmlPullParser parser, Throwable chain) {
        super(msg, chain);
    }
}
