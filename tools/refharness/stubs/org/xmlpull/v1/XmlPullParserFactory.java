package org.xmlpull.v1;

/**
 * Compile-only shim; see XmlPullParser. newInstance/newPullParser throw if
 * ever reached — the golden test exercises only the solver, never XML I/O.
 */
public class XmlPullParserFactory {
    public static final String PROPERTY_NAME = "org.xmlpull.v1.XmlPullParserFactory";

    public static XmlPullParserFactory newInstance(String classNames, Class<?> context)
            throws XmlPullParserException {
        throw new XmlPullParserException("xmlpull shim: XML parsing unavailable in refharness");
    }

    public void setNamespaceAware(boolean aware) {}

    public XmlPullParser newPullParser() throws XmlPullParserException {
        throw new XmlPullParserException("xmlpull shim: XML parsing unavailable in refharness");
    }
}
